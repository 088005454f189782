"""Neural building blocks (framework layout: [B, T, C], masks [B, T, 1]).

The reference composes models from masked 1-D conv stacks, relative-position
transformers, WaveNet gates, normalizing-flow layers and HiFi-GAN resblocks
(reference modules.py / attentions.py / transforms.py).  Here each op is a
flax.linen module designed channels-last for TPU (C on the 128-wide lane
dimension, convs lowered as NHC matmuls on the MXU).
"""
