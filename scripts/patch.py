"""Regenerate `.pitch` files for processed corpora (reference ``scripts/patch.py``)."""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _patch(folder: str, sample_rate: int, hop: int):
    from ttscube_tpu.dsp.pitch import rapt_pitch
    from ttscube_tpu.utils.wavio import read_wav

    for f in sorted(os.listdir(folder)):
        if not f.endswith(".wav"):
            continue
        base = os.path.join(folder, f[:-4])
        wav, _ = read_wav(base + ".wav", target_sr=sample_rate)
        pitch = rapt_pitch(wav, sample_rate, hop, 60.0, 400.0)
        np.save(open(base + ".pitch", "wb"), pitch)
        print(base)


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--folder", default="data/processed/train")
    parser.add_argument("--sample-rate", type=int, default=24000)
    parser.add_argument("--hop-size", type=int, default=240)
    args = parser.parse_args()
    _patch(args.folder, args.sample_rate, args.hop_size)
