#!/usr/bin/env python
"""Training entry point: ``python train.py -c configs/config.json``."""

from vispeech_tpu.train.cli import main

if __name__ == "__main__":
    main()
