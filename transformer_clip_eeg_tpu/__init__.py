"""transformer_clip_eeg_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of mikiken/transformer-clip-eeg.

The reference (mounted read-only at /root/reference) is a single-device PyTorch
research pipeline for contrastive EEG–speech representation learning on the
SparrKULee dataset.  This package is a ground-up TPU-first redesign:

  * canonical tensor layout is ``[batch, time, channels]`` (features on lanes);
  * all hot ops are jitted XLA / Pallas — no per-step Python in the train loop;
  * LSTMs are ``lax.scan`` cells with the full input projection hoisted into a
    single MXU matmul;
  * the InfoNCE similarity matrix is one batched matmul, with embeddings
    all-gathered over the ICI mesh for global-batch semantics;
  * the memory bank is an explicit train-state pytree updated functionally.

Subpackages
-----------
ops       core tensor ops/layers (conv, norms, attention, lstm, windowing, aug)
models    encoders, CLIP loss heads, memory bank, VLAAI, wav2vec2, probes
data      SparrKULee discovery/splits, windowing dataset, synthetic fixtures
train     train state, optimizers/schedulers, jitted train step, driver loop
eval      match-mismatch + regression evaluation suites
parallel  mesh construction and sharding helpers
utils     logging, config, torch-checkpoint import
serve     deployment: run loading, streaming embedders, top-k retrieval
"""

__version__ = "0.1.0"
