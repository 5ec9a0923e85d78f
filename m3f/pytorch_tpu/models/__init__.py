from m3f.pytorch_tpu.models.gru import GRU, BiGRU  # noqa: F401
from m3f.pytorch_tpu.models.audio import AudioCNN  # noqa: F401
from m3f.pytorch_tpu.models.r2plus1d import R2Plus1D  # noqa: F401
from m3f.pytorch_tpu.models.m3f import M3F  # noqa: F401
