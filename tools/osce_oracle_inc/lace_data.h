/* Stand-in for the generated lace data header; dims from the
   deployed model config (dnn/torch/osce/utils/templates.py) with
   quantized-export kernel padding (15 -> 16). */
#ifndef LACE_DATA_H
#define LACE_DATA_H

#include "nnet.h"

#define LACE_NUM_FEATURES 93
#define LACE_PITCH_EMBEDDING_DIM 64
#define LACE_NUMBITS_EMBEDDING_DIM 8
#define LACE_COND_DIM 128
#define LACE_HIDDEN_FEATURE_DIM 96
#define LACE_FRAME_SIZE 80
#define LACE_OVERLAP_SIZE 40
#define LACE_PREEMPH 0.85f
#define LACE_PITCH_MAX 300
#define LACE_NUMBITS_RANGE_LOW 50
#define LACE_NUMBITS_RANGE_HIGH 650
#define LACE_NUMBITS_SCALE_0 1.224816640f
#define LACE_NUMBITS_SCALE_1 2.449633280f
#define LACE_NUMBITS_SCALE_2 3.674449920f
#define LACE_NUMBITS_SCALE_3 4.899266560f
#define LACE_NUMBITS_SCALE_4 6.124083200f
#define LACE_NUMBITS_SCALE_5 7.348899840f
#define LACE_NUMBITS_SCALE_6 8.573716479f
#define LACE_NUMBITS_SCALE_7 9.798533119f
#define LACE_FNET_CONV2_STATE_SIZE 384
#define LACE_FNET_GRU_STATE_SIZE 128
#define LACE_CF1_KERNEL_SIZE 16
#define LACE_CF1_LEFT_PADDING 8
#define LACE_CF1_FILTER_GAIN_A 0.690776f
#define LACE_CF1_FILTER_GAIN_B 0.000000f
#define LACE_CF1_LOG_GAIN_LIMIT 1.151293f
#define LACE_CF2_KERNEL_SIZE 16
#define LACE_CF2_LEFT_PADDING 8
#define LACE_CF2_FILTER_GAIN_A 0.690776f
#define LACE_CF2_FILTER_GAIN_B 0.000000f
#define LACE_CF2_LOG_GAIN_LIMIT 1.151293f
#define LACE_AF1_KERNEL_SIZE 16
#define LACE_AF1_LEFT_PADDING 15
#define LACE_AF1_FILTER_GAIN_A 1.381551f
#define LACE_AF1_FILTER_GAIN_B 0.000000f
#define LACE_AF1_SHAPE_GAIN 1.000000f
#define LACE_AF1_IN_CHANNELS 1
#define LACE_AF1_OUT_CHANNELS 1

typedef struct {
  LinearLayer lace_pitch_embedding;
  LinearLayer lace_fnet_conv1;
  LinearLayer lace_fnet_conv2;
  LinearLayer lace_fnet_tconv;
  LinearLayer lace_fnet_gru_input;
  LinearLayer lace_fnet_gru_recurrent;
  LinearLayer lace_cf1_kernel;
  LinearLayer lace_cf1_gain;
  LinearLayer lace_cf1_global_gain;
  LinearLayer lace_cf2_kernel;
  LinearLayer lace_cf2_gain;
  LinearLayer lace_cf2_global_gain;
  LinearLayer lace_af1_kernel;
  LinearLayer lace_af1_gain;
} LACELayers;

int init_lacelayers(LACELayers *layers, const WeightArray *arrays);

#endif
