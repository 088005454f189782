"""Training CLI: ``python train.py -c configs/config.json``
(reference train.py:42-50; DDP spawn becomes a single jitted pjit program).

Multi-host TPU pods: run on every host; jax.distributed.initialize() is
called when JAX_COORDINATOR_ADDRESS is set.
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", default="configs/config.json")
    p.add_argument("-m", "--model-dir", default=None,
                   help="override train.save_dir")
    p.add_argument("--data-root", default="dataset")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--model-parallel", type=int, default=1,
                   help="size of the 'model' mesh axis (tensor parallelism)")
    p.add_argument("--profile", default=None, metavar="START:STOP",
                   help="capture an XLA/TPU trace of steps [START, STOP) "
                        "into save_dir/profile (view in TensorBoard/Perfetto)")
    from vispeech_tpu.utils.platform import add_platform_arg, apply_platform

    add_platform_arg(p)
    args = p.parse_args()
    apply_platform(args.platform)

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize()

    import dataclasses

    from vispeech_tpu.config import load_config
    from vispeech_tpu.train.loop import Trainer

    cfg = load_config(args.config)
    if args.model_dir:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, save_dir=args.model_dir)
        )

    profile_steps = None
    if args.profile:
        lo, sep, hi = args.profile.partition(":")
        if not sep or not lo.isdigit() or not hi.isdigit():
            p.error("--profile expects START:STOP (two integers)")
        profile_steps = (int(lo), int(hi))

    trainer = Trainer(cfg, data_root=args.data_root,
                      model_parallel=args.model_parallel)
    trainer.resume()
    trainer.train(max_steps=args.max_steps, profile_steps=profile_steps)


if __name__ == "__main__":
    main()
