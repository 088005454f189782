"""Inference surfaces: engine, CLI, HTTP server (reference inference.py,
inference_api.py, gui.py contracts)."""

from vispeech_tpu.infer.pipeline import TTSEngine, load_generator_params

__all__ = ["TTSEngine", "load_generator_params"]
