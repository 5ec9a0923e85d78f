from m3f.pytorch_tpu.train import convert  # noqa: F401
