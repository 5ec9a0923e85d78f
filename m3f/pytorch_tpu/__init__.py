"""TPU-native (JAX / XLA / Pallas / pjit) implementation of the m3f.pytorch
multi-modal continuous valence-arousal estimation framework.

Reference capability map: see /root/repo/SURVEY.md. The reference
(sailordiary/m3f.pytorch, the M3T model of arXiv:2002.02957) is a
PyTorch-Lightning research repo; this package is a from-scratch TPU-first
redesign:

- compute path: pure-functional JAX modules compiled under one ``jit`` region,
  NDHWC layouts, bf16 compute / fp32 params,
- parallelism: ``jax.sharding.Mesh`` + ``NamedSharding`` (GSPMD inserts ICI
  collectives) instead of torch.distributed/NCCL,
- preprocessing: fused on-device kernels (log-mel frontend, uint8->bf16
  crop/resize/normalize) instead of offline librosa/ffmpeg passes,
- hot ops: Pallas TPU kernels where a measured bottleneck survives XLA fusion.

Top-level subpackages
---------------------
``config``    typed dataclass configs (one per BASELINE.json config)
``models``    audio CNN, R(2+1)D visual backbone, BiGRU fusion head
``ops``       CCC loss/metric, log-mel frontend, overlap stitcher, preprocessing
``parallel``  device mesh, shardings, distributed init
``data``      Aff-Wild2 indexing/windowing, synthetic data, host loader
``train``     train/eval loops, checkpointing, torch weight converter
``utils``     tree and logging helpers
"""

from m3f.pytorch_tpu import config  # noqa: F401

__version__ = "0.1.0"
