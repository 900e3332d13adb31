"""Single-file / directory enhancement CLI.

    python -m cmgan_tpu.cli.enhance --input noisy.wav --output clean.wav \
        [--model_path ckpt | --torch_ckpt ckpt]
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Enhance wav file(s)")
    p.add_argument("--input", type=str, required=True, help="wav file or directory")
    p.add_argument("--output", type=str, required=True, help="wav file or directory")
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--torch_ckpt", type=str, default=None)
    p.add_argument("--exact", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    from cmgan_tpu.cli.evaluate import load_variables
    from cmgan_tpu.config import CMGANConfig
    from cmgan_tpu.data import natsorted, read_wav, write_wav
    from cmgan_tpu.inference import Enhancer

    args = parse_args(argv)
    cfg = CMGANConfig()
    enhancer = Enhancer(cfg, load_variables(cfg, args))
    mode = "exact" if args.exact else "bucket"

    if os.path.isdir(args.input):
        os.makedirs(args.output, exist_ok=True)
        names = natsorted(
            n for n in os.listdir(args.input) if n.lower().endswith(".wav")
        )
        for name in names:
            noisy, sr = read_wav(os.path.join(args.input, name))
            est = enhancer.enhance(noisy[0], mode=mode)
            write_wav(os.path.join(args.output, name), est, sr)
            print(name)
    else:
        noisy, sr = read_wav(args.input)
        est = enhancer.enhance(noisy[0], mode=mode)
        write_wav(args.output, est, sr)
        print(args.output)


if __name__ == "__main__":
    main()
