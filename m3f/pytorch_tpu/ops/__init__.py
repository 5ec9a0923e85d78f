from m3f.pytorch_tpu.ops.ccc import (ccc, ccc_loss, make_loss, masked_mean,  # noqa: F401
                                     mse_loss)
from m3f.pytorch_tpu.ops.melspec import log_mel_spectrogram, mel_filterbank  # noqa: F401
