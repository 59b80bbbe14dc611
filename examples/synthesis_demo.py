"""End-to-end synthesis demo (the reference ships examples/english-test.ipynb; this is
the script equivalent — runnable without Jupyter).

Run after training (or with the toy artifacts from tests/test_api.py):
    python examples/synthesis_demo.py --model data/cubegan --phonemizer data/phonemizer
"""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    from ttscube_tpu.api import TTSCube
    from ttscube_tpu.utils.wavio import write_wav

    if args.download:
        cube = TTSCube.load(args.download)
    else:
        cube = TTSCube(args.model, args.phonemizer)

    for i, text in enumerate([
        "Hello! This is a speech synthesis test.",
        "The quick brown fox jumps over the lazy dog.",
    ]):
        audio = cube(text, speaker=args.speaker)
        out = f"demo_{i}.wav"
        write_wav(out, audio, 24000)
        print(f"{out}: {len(audio) / 24000:.2f}s  <- {text!r}")


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--model", default="data/cubegan")
    parser.add_argument("--phonemizer", default="data/phonemizer")
    parser.add_argument("--download", default=None,
                        help="download a packaged model by name instead")
    parser.add_argument("--speaker", default="none")
    main(parser.parse_args())
