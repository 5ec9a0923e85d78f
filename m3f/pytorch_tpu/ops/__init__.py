from m3f.pytorch_tpu.ops.ccc import ccc, ccc_loss, masked_mean  # noqa: F401
from m3f.pytorch_tpu.ops.melspec import log_mel_spectrogram, mel_filterbank  # noqa: F401
