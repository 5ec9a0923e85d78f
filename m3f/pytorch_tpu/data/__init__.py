from m3f.pytorch_tpu.data.synthetic import SyntheticAVDataset  # noqa: F401
from m3f.pytorch_tpu.data.affwild2 import AffWild2Dataset  # noqa: F401
