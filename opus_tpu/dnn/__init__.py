"""Neural model runtime for the DNN subsystems (DRED, deep PLC/FARGAN,
OSCE, lossgen, pitch DNN).  TPU-native rebuild of the reference dnn/
directory: dense float matmuls on the MXU instead of hand-written
SIMD sgemv kernels (reference: dnn/vec.h, dnn/vec_avx.h)."""
