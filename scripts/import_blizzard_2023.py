"""Blizzard-2023 corpus importer (reference ``scripts/import_blizzard_2023.py``).

Input: '|'-separated alignment file (file|start|end|text|phones|durs) + chapter wavs in
the same folder. Output: data/processed/{train,dev}/{id}.{wav,mgc,pitch,json,png}.
"""

import datetime
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _import_dataset(args):
    from ttscube_tpu.data.importers import (
        build_context, correct_alignments, import_audio, read_alignment_dataset,
        split_train_dev)

    lines = open(args.input_file).readlines()
    lines = correct_alignments(lines)
    dataset, total_time = read_alignment_dataset(lines, speaker=args.speaker)
    dataset = build_context(dataset, args.prev_sentences, args.next_sentences)
    trainset, devset = split_train_dev(dataset, args.dev_ratio)

    print("Found {0} valid sentences, with a total audio time of {1}.".format(
        len(dataset), datetime.timedelta(seconds=total_time / 1000)))
    print("Trainset will contain {0} examples and devset {1} examples".format(
        len(trainset), len(devset)))
    input_folder = os.path.dirname(os.path.abspath(args.input_file))
    print("Processing trainset")
    import_audio(trainset, args.train_output, input_folder, args.sample_rate,
                 args.hop_size, args.prefix)
    print("Processing devset")
    import_audio(devset, args.dev_output, input_folder, args.sample_rate,
                 args.hop_size, args.prefix)


if __name__ == "__main__":
    parser = ArgumentParser(description="ttscube_tpu Blizzard-2023 importer")
    parser.add_argument("--input-file", dest="input_file", required=True)
    parser.add_argument("--prev-sentences", dest="prev_sentences", type=int, default=5)
    parser.add_argument("--next-sentences", dest="next_sentences", type=int, default=5)
    parser.add_argument("--dev-ratio", dest="dev_ratio", type=float, default=0.001)
    parser.add_argument("--speaker", dest="speaker", default="none")
    parser.add_argument("--sample-rate", dest="sample_rate", type=int, default=24000)
    parser.add_argument("--hop-size", dest="hop_size", type=int, default=240)
    parser.add_argument("--prefix", dest="prefix", default="FILE")
    parser.add_argument("--train-output", dest="train_output",
                        default="data/processed/train/")
    parser.add_argument("--dev-output", dest="dev_output",
                        default="data/processed/dev/")
    _import_dataset(parser.parse_args())
