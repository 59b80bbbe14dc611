"""Phonemizer training-data importer (reference ``scripts/import_phonemizer_blizzard.py``):
alignment file → {base}.train/.dev JSON lists with hybrid transcriptions."""

import datetime
import json
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _import_dataset(args):
    from ttscube_tpu.data.importers import (
        merge_alignment, parse_alignment_line, split_train_dev)

    dataset, total_time = [], 0
    for line in open(args.input_file):
        d = parse_alignment_line(line)
        if d is None or len(d["text"]) != len(d["phon"]) or \
                len(d["text"]) != len(d["durs"]):
            continue
        hybrid, words, phon2word, _ = merge_alignment(d["text"], d["phon"], d["durs"])
        total_time += sum(d["durs"])
        dataset.append({
            "orig_text": d["text"],
            "hybrid": hybrid,
            "phones": d["phon"],
            "words": words,
            "phon2word": phon2word,
        })
    trainset, devset = split_train_dev(dataset, args.dev_ratio)
    print("Found {0} valid sentences, with a total audio time of {1}.".format(
        len(dataset), datetime.timedelta(seconds=total_time / 1000)))
    print("Trainset will contain {0} examples and devset {1} examples".format(
        len(trainset), len(devset)))
    json.dump(trainset, open(f"{args.output_base}.train", "w"))
    json.dump(devset, open(f"{args.output_base}.dev", "w"))


if __name__ == "__main__":
    parser = ArgumentParser(description="ttscube_tpu phonemizer-data importer")
    parser.add_argument("--input-file", dest="input_file", required=True)
    parser.add_argument("--dev-ratio", dest="dev_ratio", type=float, default=0.001)
    parser.add_argument("--output-base", dest="output_base", required=True)
    _import_dataset(parser.parse_args())
