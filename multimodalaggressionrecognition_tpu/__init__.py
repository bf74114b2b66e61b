"""TPU-native multimodal aggression recognition framework.

A ground-up JAX/Flax/pjit/Pallas rebuild of the capabilities of the reference
PyTorch codebase cafe1930/MultimodalAggressionRecognition (audio-visual-textual
aggression recognition on AVABOS-style clip data).

Subpackages
-----------
ops       fixed-shape tensor ops (pad, frame, STFT, resample, video preproc),
          masked losses, on-device metrics; Pallas TPU kernels under ops.pallas.
models    Flax model zoo: CNN1D, wav2vec-style conv encoder, GRU/LSTM heads,
          torch-semantics transformer encoders, R3D-18 / S3D / Swin3D-T / VGG11-BN,
          fusion modules and the PhysVerb multimodal model.
data      AVABOS intervals table, EMPTY-modality protocol, aggr-type batch
          grouping, host decode + device prefetch pipeline, synthetic fixtures.
train     jit'd train/eval steps (data-parallel over a device mesh), trainer
          loop with CSV logs / best-metric checkpointing / resume.
parallel  mesh construction and sharding rules.
io        orbax checkpointing and torch-checkpoint weight import.
cli       entry points mirroring the reference scripts.

Conventions: sequence tensors are (B, T, C); video tensors are (B, T, H, W, C)
(channels-last, TPU friendly — the reference's (B, C, T, H, W) is converted at
the import boundary).
"""

__version__ = "0.1.0"
