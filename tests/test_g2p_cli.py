"""G2P orchestration tests: vocab cutoff, lexicon override, train→eval→transcribe via
the CLI surface (reference g2p.py semantics)."""

import subprocess
import sys

import numpy as np
import pytest

from ttscube_tpu.models.g2p import G2P, G2PDataset


@pytest.fixture(scope="module")
def lexicon_file(tmp_path_factory):
    base = tmp_path_factory.mktemp("g2p")
    rng = np.random.default_rng(0)
    words = ["cat", "bat", "hat", "mat", "rat", "sat", "cab", "tab", "lab", "dab"]
    lines = []
    for w in words * 4:  # enough occurrences to clear the cutoff
        trans = " ".join(ph.upper() for ph in w)
        lines.append(f"{w}\t{trans}")
    (base / "train.tsv").write_text("\n".join(lines))
    (base / "dev.tsv").write_text("\n".join(lines[:10]))
    return base


def test_update_encodings_cutoff():
    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".tsv", delete=False) as f:
        f.write("aa\tA A\naa\tA A\nzq\tZ Q\n")  # 'z','q' appear once → cut
        path = f.name
    ds = G2PDataset(path)
    g2p = G2P()
    g2p.update_encodings(ds, cutoff=2)
    assert "a" in g2p.token2int and "z" not in g2p.token2int
    assert "A" in g2p.label2int and "Z" not in g2p.label2int
    os.unlink(path)


def test_lexicon_override_and_tokens(lexicon_file):
    g2p = G2P()
    ds = G2PDataset(str(lexicon_file / "train.tsv"))
    g2p.update_encodings(ds, cutoff=1)
    g2p.initialize_network()
    g2p.lookup["cat"] = ["K", "AE", "T"]
    tokens = g2p("cat bat")
    assert tokens[0].transcription == ["K", "AE", "T"]  # lexicon wins
    assert tokens[1].transcription == [" "]  # space token
    assert isinstance(tokens[2].transcription, list)  # model output for 'bat'


def test_cli_train_eval_transcribe(lexicon_file, tmp_path):
    env_script = [sys.executable, "scripts/g2p.py"]
    base = str(tmp_path / "g2p_model")
    r = subprocess.run(env_script + [
        "--train-file", str(lexicon_file / "train.tsv"),
        "--dev-file", str(lexicon_file / "dev.tsv"),
        "--store", base, "--batch-size", "8", "--max-epochs", "2",
        "--patience", "2"], capture_output=True, text=True, cwd="/root/repo",
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Devset accuracy" in r.stdout

    r = subprocess.run(env_script + ["--test-file", str(lexicon_file / "dev.tsv"),
                                     "--load", base],
                       capture_output=True, text=True, cwd="/root/repo",
                       env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Word accuracy rate" in r.stdout

    wl = tmp_path / "words.txt"
    wl.write_text("cat\nbat\n")
    out = tmp_path / "trans.tsv"
    r = subprocess.run(env_script + ["--transcribe-file", str(wl),
                                     "--output-file", str(out), "--model", base],
                       capture_output=True, text=True, cwd="/root/repo",
                       env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"})
    assert r.returncode == 0, r.stderr[-2000:]
    lines = out.read_text().strip().split("\n")
    assert len(lines) == 2 and lines[0].startswith("cat\t")
