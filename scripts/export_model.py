"""Model packaging CLI (reference ``scripts/export_model.py``): strips discriminators,
tars cubegan.{model,yaml,encodings} + phonemizer.{model,encodings}, splits into 49 MB
volumes, writes a model-descriptor YAML. Inverse of utils/repository.download_model."""

import os
import sys
import tarfile
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _export(args):
    import yaml

    from flax import serialization

    from ttscube_tpu.utils.repository import split_volumes

    sys.stdout.write("Loading model and removing discriminators... ")
    with open(args.input_model + ".last", "rb") as f:
        state = serialization.msgpack_restore(f.read())
    # synthesis needs only the conditioning net + generator (reference :23-26)
    slim = {k: v for k, v in state.items() if k in ("lang", "gen")}
    with open(args.input_model + ".model", "wb") as f:
        f.write(serialization.msgpack_serialize(slim))
    sys.stdout.write("done\nCreating archive...\n")

    tar_path = args.output_model + ".tar.gz"
    with tarfile.open(tar_path, "w:gz") as tar:
        for ext, out in [("model", "cubegan.model"), ("yaml", "cubegan.yaml"),
                         ("encodings", "cubegan.encodings")]:
            src = f"{args.input_model}.{ext}"
            sys.stdout.write(f"\t{src}\n")
            tar.add(src, out)
        for ext, out in [(args.phonemizer_weights, "phonemizer.model"),
                         ("encodings", "phonemizer.encodings")]:
            src = f"{args.input_phonemizer}.{ext}"
            sys.stdout.write(f"\t{src}\n")
            tar.add(src, out)

    sys.stdout.write("Splitting the model into multiple volumes... ")
    n = split_volumes(tar_path, args.output_model)
    os.unlink(tar_path)
    sys.stdout.write(f"{n} volumes\n")

    yaml.safe_dump({"version": args.version, "phonemizer": "sentence",
                    "synthesis": "cubegan", "language": args.language,
                    "description": args.description},
                   open(args.output_model + ".yaml", "w"))


if __name__ == "__main__":
    parser = ArgumentParser(description="ttscube_tpu model export")
    parser.add_argument("--input-model", dest="input_model", required=True)
    parser.add_argument("--input-phonemizer", dest="input_phonemizer", required=True)
    parser.add_argument("--phonemizer-weights", dest="phonemizer_weights",
                        default="sacc.best",
                        help="which phonemizer checkpoint to package (default sacc.best)")
    parser.add_argument("--output-model", dest="output_model", required=True)
    parser.add_argument("--version", dest="version", default="1.0.0")
    parser.add_argument("--language", dest="language", default="multi")
    parser.add_argument("--description", dest="description", default="")
    _export(parser.parse_args())
