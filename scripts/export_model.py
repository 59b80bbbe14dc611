"""Model packaging CLI (reference ``scripts/export_model.py``): strips discriminators,
tars cubegan.{model,yaml,encodings} + phonemizer.{model,encodings}, splits into 49 MB
volumes, writes a model-descriptor YAML. Inverse of utils/repository.download_model."""

import os
import sys
import tarfile
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force_cpu_backend():
    """Packaging is CPU work: pin jax to CPU so export never occupies (or waits on)
    the TPU — on the axon relay every eager op costs ~0.4 s and the phonemizer
    template init below is hundreds of them. The env var alone loses to the axon
    plugin; the config update must run before the first backend init."""
    import jax

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # backend already initialized (library use, e.g. tests): keep it


def _validate_phonemizer(base: str, weights_ext: str):
    """Fail fast if the packaged weights don't deserialize into the aligned Phonemizer
    template TTSCube will instantiate (e.g. an M2M checkpoint from train_phonemizer's
    default --model-type; the API's text frontend uses the aligned model only)."""
    import jax
    import jax.numpy as jnp

    from ttscube_tpu.data.encodings import PhonemizerEncodings
    from ttscube_tpu.models.phonemizer import Phonemizer, PhonemizerConfig
    from ttscube_tpu.utils.checkpoint import load_params

    penc = PhonemizerEncodings(base + ".encodings")
    pmodel = Phonemizer(PhonemizerConfig(num_graphemes=len(penc.graphemes),
                                         num_phonemes=len(penc.phonemes)))
    template = jax.device_get(pmodel.init(
        jax.random.PRNGKey(0),
        {"x_char": jnp.zeros((1, 8), jnp.int32),
         "x_case": jnp.zeros((1, 8), jnp.int32)})["params"])
    try:
        load_params(f"{base}.{weights_ext}", template)
    except Exception as e:
        raise SystemExit(
            f"'{base}.{weights_ext}' does not match the aligned Phonemizer template "
            f"the TTSCube API deserializes into ({e}).\nPackage a checkpoint trained "
            "with train_phonemizer.py --model-type aligned, or pass "
            "--phonemizer-weights pointing at one.") from e


def _export(args):
    import yaml

    _force_cpu_backend()

    from flax import serialization

    from ttscube_tpu.utils.repository import split_volumes

    sys.stdout.write("Loading model and removing discriminators... ")
    with open(args.input_model + ".last", "rb") as f:
        state = serialization.msgpack_restore(f.read())
    # synthesis needs only the conditioning net + generator (+ the LM encoder for
    # hf-conditioned models; reference :23-26 deletes the discriminators)
    slim = {k: v for k, v in state.items() if k in ("lang", "gen", "hf")}
    with open(args.input_model + ".model", "wb") as f:
        f.write(serialization.msgpack_serialize(slim))
    sys.stdout.write("done\nCreating archive...\n")

    _validate_phonemizer(args.input_phonemizer, args.phonemizer_weights)

    # conditioned models must ship their word-vector table, or synthesis has no
    # x_words source (the reference re-downloads fastText at inference; we package)
    conf = yaml.safe_load(open(args.input_model + ".yaml"))
    conditioning = conf.get("conditioning")
    wordvec_npz = None
    if conditioning and conditioning.startswith("fasttext"):
        if not args.wordvec:
            raise SystemExit(
                f"model was trained with conditioning={conditioning}; pass --wordvec "
                "<table.vec|table.npz> so the API can reproduce x_words at inference")
        from ttscube_tpu.utils.wordvec import WordVectors

        if args.wordvec.endswith(".npz"):
            wordvec_npz = args.wordvec
        else:
            wv = WordVectors.load_vec(args.wordvec)
            wordvec_npz = args.input_model + ".wordvec.npz"
            wv.save_npz(wordvec_npz)

    tar_path = args.output_model + ".tar.gz"
    with tarfile.open(tar_path, "w:gz") as tar:
        for ext, out in [("model", "cubegan.model"), ("yaml", "cubegan.yaml"),
                         ("encodings", "cubegan.encodings")]:
            src = f"{args.input_model}.{ext}"
            sys.stdout.write(f"\t{src}\n")
            tar.add(src, out)
        if wordvec_npz is not None:
            sys.stdout.write(f"\t{wordvec_npz}\n")
            tar.add(wordvec_npz, "cubegan.wordvec.npz")
        if conditioning and conditioning.startswith("hf:"):
            # package the HF tokenizer files so the download is portable — the
            # yaml's conditioning spec may name a training-box-local path. The LM
            # encoder weights already travel inside cubegan.model (the "hf" subtree);
            # only the tokenizer/config files are needed at inference.
            hf_dir = conditioning.split(":", 1)[1]
            for fn in sorted(os.listdir(hf_dir)):
                if fn.endswith((".bin", ".safetensors", ".h5", ".msgpack", ".ot")):
                    continue
                sys.stdout.write(f"\t{os.path.join(hf_dir, fn)}\n")
                tar.add(os.path.join(hf_dir, fn), f"cubegan.hf/{fn}")
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
    parser.add_argument("--wordvec", dest="wordvec", default=None,
                        help="word-vector table (.vec/.npz) to package for "
                             "fasttext-conditioned models")
    parser.add_argument("--version", dest="version", default="1.0.0")
    parser.add_argument("--language", dest="language", default="multi")
    parser.add_argument("--description", dest="description", default="")
    _export(parser.parse_args())
