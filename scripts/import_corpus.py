"""Legacy corpus importer (reference ``scripts/import_corpus.py``): folders of
{name}.{txt,wav,phs} triples → data/processed/{train,dev}/{name}.{txt,lab,mgc,f0}
with HTK .phs alignment merged into per-frame labels."""

import os
import shutil
import sys
from argparse import ArgumentParser
from os.path import exists, join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _scan(folder, need_phs=True):
    out = []
    if folder is None:
        return out
    for f in sorted(os.listdir(folder)):
        if not os.path.isfile(join(folder, f)):
            continue
        base = f[:-4]
        need = [base + ".txt", base + ".wav"] + ([base + ".phs"] if need_phs else [])
        if all(exists(join(folder, n)) for n in need) and base not in out:
            out.append(base)
    return out


def _process(files, base_folder, out_folder, args, g2p, counter_start=0):
    import jax

    from ttscube_tpu.data.importers import create_lab_file, highpass_filter
    from ttscube_tpu.dsp.mel import MelSpec, feature_mel_config
    from ttscube_tpu.dsp.pitch import rapt_pitch
    from ttscube_tpu.utils.wavio import read_wav

    os.makedirs(out_folder, exist_ok=True)
    cpu = jax.local_devices(backend="cpu")[0]
    mel = jax.jit(MelSpec(feature_mel_config(args.target_sample_rate, args.mgc_order,
                                             hop_length=256)))
    total = counter_start
    for i, base in enumerate(files):
        total += 1
        sys.stdout.write(f"\r\tprocessing file {i + 1}/{len(files)}")
        sys.stdout.flush()
        tgt = base if args.prefix is None else f"{args.prefix}_{total:05d}"
        shutil.copyfile(join(base_folder, base + ".txt"), join(out_folder, tgt + ".txt"))
        data, _ = read_wav(join(base_folder, base + ".wav"),
                           target_sr=args.target_sample_rate)
        f0 = rapt_pitch(data, args.target_sample_rate, 256, 30.0, 500.0)
        peak = float(np.max(np.abs(data))) or 1.0
        data = data / peak * 0.999
        data = highpass_filter(data, args.target_sample_rate)
        mgc = np.asarray(mel(jax.device_put(data, cpu)))
        phs = join(base_folder, base + ".phs")
        if exists(phs):
            if not create_lab_file(join(base_folder, base + ".txt"), phs, mgc.shape[0],
                                   join(out_folder, tgt + ".lab"),
                                   speaker_name=args.speaker, g2p=g2p, lang=args.lang,
                                   emotion=args.emotion):
                continue
        np.save(join(out_folder, tgt + ".mgc"), mgc)
        np.save(join(out_folder, tgt + ".f0"), f0)
    sys.stdout.write("\n")
    return total


def phase_1_prepare_corpus(args):
    g2p = None
    if args.g2p:
        from ttscube_tpu.models.g2p import G2P

        g2p = G2P()
        g2p.load(args.g2p)
    train_files = _scan(args.train_folder)
    dev_files = _scan(args.dev_folder, need_phs=False)
    sys.stdout.write(f"found {len(train_files)} training / {len(dev_files)} dev files\n")
    n = _process(train_files, args.train_folder, args.train_output, args, g2p)
    _process(dev_files, args.dev_folder, args.dev_output, args, g2p, counter_start=n)


if __name__ == "__main__":
    parser = ArgumentParser(description="ttscube_tpu legacy corpus importer")
    parser.add_argument("--train-folder", dest="train_folder", required=True)
    parser.add_argument("--dev-folder", dest="dev_folder", default=None)
    parser.add_argument("--target-sample-rate", dest="target_sample_rate", type=int,
                        default=16000)
    parser.add_argument("--mgc-order", dest="mgc_order", type=int, default=80)
    parser.add_argument("--speaker", dest="speaker", default=None)
    parser.add_argument("--g2p", dest="g2p", default=None)
    parser.add_argument("--prefix", dest="prefix", default=None)
    parser.add_argument("--lang", dest="lang", default="none")
    parser.add_argument("--emotion", dest="emotion", default="neutral")
    parser.add_argument("--train-output", dest="train_output",
                        default="data/processed/train")
    parser.add_argument("--dev-output", dest="dev_output", default="data/processed/dev")
    phase_1_prepare_corpus(parser.parse_args())
