"""Inference: Predictor serving API, postprocessing, submission output."""

from m3f.pytorch_tpu.infer.predictor import (Predictor,  # noqa: F401
                                             SessionGroup)
