"""Command-line synthesis (reference inference.py:21-46).

    python -m vispeech_tpu.infer.cli -c configs/config.json -k logdir/run \
        -t "你好世界" -s 0 -o out.wav
"""

from __future__ import annotations

import argparse
import time

import numpy as np
from scipy.io import wavfile


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-k", "--ckpt-dir", required=True)
    p.add_argument("-t", "--text", required=True)
    p.add_argument("-s", "--speaker", default="0")
    p.add_argument("-o", "--output", default="out.wav")
    p.add_argument("--noise-scale", type=float, default=0.667)
    p.add_argument("--duration-scale", type=float, default=None)
    p.add_argument("--pitch-scale", type=float, default=None)
    p.add_argument("--energy-scale", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    from vispeech_tpu.utils.platform import add_platform_arg, apply_platform

    add_platform_arg(p)
    args = p.parse_args()
    apply_platform(args.platform)

    from vispeech_tpu.infer.pipeline import TTSEngine

    engine = TTSEngine.from_checkpoint(args.config, args.ckpt_dir)
    speaker = int(args.speaker) if args.speaker.isdigit() else args.speaker
    t0 = time.time()
    out = engine.synthesize(
        text=args.text,
        speaker=speaker,
        noise_scale=args.noise_scale,
        duration_control=args.duration_scale,
        pitch_control=args.pitch_scale,
        energy_control=args.energy_scale,
        seed=args.seed,
    )
    dt = time.time() - t0
    wav = out["audio"]
    sr = out["sampling_rate"]
    wavfile.write(
        args.output, sr, (np.clip(wav, -1, 1) * 32767).astype(np.int16)
    )
    print(f"wrote {args.output}: {len(wav) / sr:.2f}s audio in {dt:.2f}s "
          f"({len(wav) / sr / dt:.1f}x realtime)")
    print("phones:", " ".join(out["phones"]))


if __name__ == "__main__":
    main()
