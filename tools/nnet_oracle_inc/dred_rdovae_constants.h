/* Stub for the tarball-generated constants header: only the buffer
   sizing macros nnet.c needs (values are upper bounds, not model dims). */
#ifndef DRED_RDOVAE_CONSTANTS_H
#define DRED_RDOVAE_CONSTANTS_H
#define DRED_MAX_RNN_NEURONS 1536
#define DRED_MAX_CONV_INPUTS 2048
#endif
