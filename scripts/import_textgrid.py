"""MFA TextGrid corpus importer (reference ``scripts/import_textgrid.py``).

Input: a folder tree of {name}.TextGrid + {name}.wav pairs (tiers: words, phones,
utterance text); optional source book text for paragraph context recovery.
Output: data/processed/{train,dev}/{id}.{wav,mgc,pitch,json,png}.
"""

import datetime
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get_all_files(folder):
    out = []
    for root, _, files in os.walk(folder):
        for f in files:
            if f.lower().endswith(".textgrid"):
                base = os.path.join(root, f)[: -len(".TextGrid")]
                if os.path.exists(base + ".wav"):
                    out.append(base)
    return sorted(out)


def _import_dataset(args):
    from ttscube_tpu.data.importers import (
        fetch_context, import_audio, merge_textgrid, scrub_uppercase_phones,
        split_train_dev)
    from ttscube_tpu.data.text import SimpleTokenizer
    from ttscube_tpu.data.textgrid import parse_textgrid

    tokenizer = SimpleTokenizer()
    all_files = _get_all_files(args.input_folder)
    print(f"Found {len(all_files)} aligned files")
    dataset, total_time = [], 0
    for base in all_files:
        tiers = parse_textgrid(base + ".TextGrid")
        if len(tiers) < 3 or not tiers[2]:
            continue
        orig_text = " " + tiers[2][0]["text"]
        norm_words = []
        if tiers[0] and tiers[0][0]["text"] not in ("<eps>", ""):
            norm_words.append({"text": " ", "start": 0.0, "stop": 0.0})
        norm_words += tiers[0]
        phons = tiers[1]
        tok_words = tokenizer(orig_text)
        hybrid, phon2word, frame2phon = merge_textgrid(norm_words, phons, tok_words)
        total_time += len(frame2phon) * 10
        dataset.append({
            "orig_start": 0,
            "orig_end": len(frame2phon) * 10,
            "orig_filename": os.path.basename(base),
            "orig_text": orig_text,
            "phones": hybrid,
            "words": [w.word for w in tok_words],
            "phon2word": phon2word,
            "frame2phon": frame2phon,
            "speaker": args.speaker,
            "left_context": "",
            "right_context": "",
        })

    trainset, devset = split_train_dev(dataset, args.dev_ratio)
    print("Found {0} valid sentences, with a total audio time of {1}.".format(
        len(dataset), datetime.timedelta(seconds=total_time / 1000)))
    print("Trainset will contain {0} examples and devset {1} examples".format(
        len(trainset), len(devset)))
    if args.original_text:
        print("Fetching context")
        fetch_context(trainset, args.original_text)
        fetch_context(devset, args.original_text)
    trainset = [scrub_uppercase_phones(x) for x in trainset]
    devset = [scrub_uppercase_phones(x) for x in devset]

    # TextGrid wavs are per-utterance; segments address the whole file
    print("Processing trainset")
    import_audio(trainset, args.train_output, args.input_folder, args.sample_rate,
                 args.hop_size, args.prefix)
    print("Processing devset")
    import_audio(devset, args.dev_output, args.input_folder, args.sample_rate,
                 args.hop_size, args.prefix)


if __name__ == "__main__":
    parser = ArgumentParser(description="ttscube_tpu TextGrid importer")
    parser.add_argument("--input-folder", dest="input_folder", required=True)
    parser.add_argument("--dev-ratio", dest="dev_ratio", type=float, default=0.001)
    parser.add_argument("--speaker", dest="speaker", default="none")
    parser.add_argument("--sample-rate", dest="sample_rate", type=int, default=24000)
    parser.add_argument("--hop-size", dest="hop_size", type=int, default=240)
    parser.add_argument("--prefix", dest="prefix", default="FILE")
    parser.add_argument("--original-text", dest="original_text", default=None)
    parser.add_argument("--train-output", dest="train_output",
                        default="data/processed/train/")
    parser.add_argument("--dev-output", dest="dev_output",
                        default="data/processed/dev/")
    _import_dataset(parser.parse_args())
