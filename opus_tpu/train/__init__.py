"""Training layer (reference: dnn/torch/ + training/rnn_train.py).

JAX training loops that produce weight blobs consumable by the
opus_tpu.dnn runtime via opus_tpu/dnn/weights.py — closing the
reference's L7 layer: the framework can train, export and then run its
own models."""
