"""Serving: the production inference path (no reference counterpart —

the reference's inference flow lives in notebooks/dev-model.ipynb)."""

from detr_tpu.serve.engine import InferenceEngine

__all__ = ["InferenceEngine"]
