"""vispeech_tpu — a TPU-native (JAX/XLA/Pallas/pjit) VITS+FastSpeech2+VISinger hybrid
TTS framework with the capabilities of innnky/vispeech, redesigned TPU-first.

Layer map (mirrors the reference's capability surface, see SURVEY.md):
  text/      — multilingual text frontend (zh/ja/en/pinyin) → phoneme ids
  dsp/       — device-side 44.1 kHz STFT / mel front end
  ops/       — neural building blocks (rel-pos attention, WaveNet stacks, flows,
               RQ splines, MRF resblocks, length regulator) + Pallas kernels
  models/    — Synthesizer (generator) and Multi-Period/Scale discriminators
  train/     — GAN training step, losses, checkpointing, metrics
  data/      — filelist dataset, length-bucketed batching, host prefetch
  parallel/  — device mesh construction and sharding rules
  infer/     — end-to-end TTS pipeline, prosody editing, HTTP serving
"""

__version__ = "0.1.0"
