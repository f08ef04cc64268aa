/* Stand-in for the generated nolace data header; dims from the
   deployed model config (dnn/torch/osce/utils/templates.py) with
   quantized-export kernel padding (15 -> 16). */
#ifndef NOLACE_DATA_H
#define NOLACE_DATA_H

#include "nnet.h"

#define NOLACE_NUM_FEATURES 93
#define NOLACE_PITCH_EMBEDDING_DIM 64
#define NOLACE_NUMBITS_EMBEDDING_DIM 8
#define NOLACE_COND_DIM 256
#define NOLACE_HIDDEN_FEATURE_DIM 96
#define NOLACE_FRAME_SIZE 80
#define NOLACE_OVERLAP_SIZE 40
#define NOLACE_PREEMPH 0.85f
#define NOLACE_PITCH_MAX 300
#define NOLACE_NUMBITS_RANGE_LOW 50
#define NOLACE_NUMBITS_RANGE_HIGH 650
#define NOLACE_NUMBITS_SCALE_0 1.224816640f
#define NOLACE_NUMBITS_SCALE_1 2.449633280f
#define NOLACE_NUMBITS_SCALE_2 3.674449920f
#define NOLACE_NUMBITS_SCALE_3 4.899266560f
#define NOLACE_NUMBITS_SCALE_4 6.124083200f
#define NOLACE_NUMBITS_SCALE_5 7.348899840f
#define NOLACE_NUMBITS_SCALE_6 8.573716479f
#define NOLACE_NUMBITS_SCALE_7 9.798533119f
#define NOLACE_FNET_CONV2_STATE_SIZE 384
#define NOLACE_FNET_GRU_STATE_SIZE 256
#define NOLACE_CF1_KERNEL_SIZE 16
#define NOLACE_CF1_LEFT_PADDING 8
#define NOLACE_CF1_FILTER_GAIN_A 0.690776f
#define NOLACE_CF1_FILTER_GAIN_B 0.000000f
#define NOLACE_CF1_LOG_GAIN_LIMIT 1.151293f
#define NOLACE_CF2_KERNEL_SIZE 16
#define NOLACE_CF2_LEFT_PADDING 8
#define NOLACE_CF2_FILTER_GAIN_A 0.690776f
#define NOLACE_CF2_FILTER_GAIN_B 0.000000f
#define NOLACE_CF2_LOG_GAIN_LIMIT 1.151293f
#define NOLACE_AF1_KERNEL_SIZE 16
#define NOLACE_AF1_LEFT_PADDING 15
#define NOLACE_AF1_FILTER_GAIN_A 1.381551f
#define NOLACE_AF1_FILTER_GAIN_B 0.000000f
#define NOLACE_AF1_SHAPE_GAIN 1.000000f
#define NOLACE_AF1_IN_CHANNELS 1
#define NOLACE_AF1_OUT_CHANNELS 2
#define NOLACE_AF2_KERNEL_SIZE 16
#define NOLACE_AF2_LEFT_PADDING 15
#define NOLACE_AF2_FILTER_GAIN_A 1.381551f
#define NOLACE_AF2_FILTER_GAIN_B 0.000000f
#define NOLACE_AF2_SHAPE_GAIN 1.000000f
#define NOLACE_AF2_IN_CHANNELS 2
#define NOLACE_AF2_OUT_CHANNELS 2
#define NOLACE_AF3_KERNEL_SIZE 16
#define NOLACE_AF3_LEFT_PADDING 15
#define NOLACE_AF3_FILTER_GAIN_A 1.381551f
#define NOLACE_AF3_FILTER_GAIN_B 0.000000f
#define NOLACE_AF3_SHAPE_GAIN 1.000000f
#define NOLACE_AF3_IN_CHANNELS 2
#define NOLACE_AF3_OUT_CHANNELS 2
#define NOLACE_AF4_KERNEL_SIZE 16
#define NOLACE_AF4_LEFT_PADDING 15
#define NOLACE_AF4_FILTER_GAIN_A 1.381551f
#define NOLACE_AF4_FILTER_GAIN_B 0.000000f
#define NOLACE_AF4_SHAPE_GAIN 1.000000f
#define NOLACE_AF4_IN_CHANNELS 2
#define NOLACE_AF4_OUT_CHANNELS 1
#define NOLACE_TDSHAPE1_FEATURE_DIM 256
#define NOLACE_TDSHAPE1_FRAME_SIZE 80
#define NOLACE_TDSHAPE1_AVG_POOL_K 4
#define NOLACE_TDSHAPE2_FEATURE_DIM 256
#define NOLACE_TDSHAPE2_FRAME_SIZE 80
#define NOLACE_TDSHAPE2_AVG_POOL_K 4
#define NOLACE_TDSHAPE3_FEATURE_DIM 256
#define NOLACE_TDSHAPE3_FRAME_SIZE 80
#define NOLACE_TDSHAPE3_AVG_POOL_K 4

typedef struct {
  LinearLayer nolace_pitch_embedding;
  LinearLayer nolace_fnet_conv1;
  LinearLayer nolace_fnet_conv2;
  LinearLayer nolace_fnet_tconv;
  LinearLayer nolace_fnet_gru_input;
  LinearLayer nolace_fnet_gru_recurrent;
  LinearLayer nolace_cf1_kernel;
  LinearLayer nolace_cf1_gain;
  LinearLayer nolace_cf1_global_gain;
  LinearLayer nolace_cf2_kernel;
  LinearLayer nolace_cf2_gain;
  LinearLayer nolace_cf2_global_gain;
  LinearLayer nolace_af1_kernel;
  LinearLayer nolace_af1_gain;
  LinearLayer nolace_af2_kernel;
  LinearLayer nolace_af2_gain;
  LinearLayer nolace_af3_kernel;
  LinearLayer nolace_af3_gain;
  LinearLayer nolace_af4_kernel;
  LinearLayer nolace_af4_gain;
  LinearLayer nolace_tdshape1_alpha1_f;
  LinearLayer nolace_tdshape1_alpha1_t;
  LinearLayer nolace_tdshape1_alpha2;
  LinearLayer nolace_tdshape2_alpha1_f;
  LinearLayer nolace_tdshape2_alpha1_t;
  LinearLayer nolace_tdshape2_alpha2;
  LinearLayer nolace_tdshape3_alpha1_f;
  LinearLayer nolace_tdshape3_alpha1_t;
  LinearLayer nolace_tdshape3_alpha2;
  LinearLayer nolace_post_cf1;
  LinearLayer nolace_post_cf2;
  LinearLayer nolace_post_af1;
  LinearLayer nolace_post_af2;
  LinearLayer nolace_post_af3;
} NOLACELayers;

int init_nolacelayers(NOLACELayers *layers, const WeightArray *arrays);

#endif
