"""Build a LOCAL HF-format BERT model directory for the demo-corpus HF-conditioning
drive (this environment has no hub access; reference trainers pull from the hub,
ref scripts/train_cubegan.py --lm-model).

The tokenizer is a WordPiece+Metaspace fast tokenizer whose vocab covers the demo
corpus lexicon (scripts/make_demo_corpus.py WORDS) — long words are split into
word-start ('▁') + continuation ('##') pieces so the word2tok walk
(ttscube_tpu/utils/hf.py, reference cube/utils/hf.py:29-45) is exercised on real
multi-subtoken words. Weights are a seeded random-init torch BertModel saved as
pytorch_model.bin, imported through ttscube_tpu.models.lm.load_local_lm; the GAN
trainer fine-tunes the 'b' partition at lr=1e-6 exactly like the reference
(ref cube/networks/cubegan.py:299-302).

Usage: python scripts/make_demo_lm.py --output /tmp/drive_r3/demo_lm
"""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from make_demo_corpus import WORDS  # the demo lexicon


def build_vocab():
    vocab = ["[PAD]", "[UNK]"]
    seen = set(vocab)
    for w in sorted(WORDS):
        # split words >4 chars into a word-start piece and a continuation piece so
        # tokenization produces genuine multi-subtoken words
        pieces = (["▁" + w] if len(w) <= 4 else
                  ["▁" + w[:3], "##" + w[3:]])
        for p in pieces:
            if p not in seen:
                seen.add(p)
                vocab.append(p)
    for extra in ["▁_", "▁.", "."]:  # space placeholder + sentence punctuation
        if extra not in seen:
            seen.add(extra)
            vocab.append(extra)
    return vocab


def main(args):
    import torch
    import transformers
    from tokenizers import Tokenizer
    from tokenizers.models import WordPiece
    from tokenizers.pre_tokenizers import Metaspace

    vocab = build_vocab()
    os.makedirs(args.output, exist_ok=True)
    tok = Tokenizer(WordPiece({w: i for i, w in enumerate(vocab)},
                              unk_token="[UNK]", max_input_chars_per_word=100))
    tok.pre_tokenizer = Metaspace()
    fast = transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="[UNK]", pad_token="[PAD]")
    fast.save_pretrained(args.output)

    cfg = transformers.BertConfig(
        vocab_size=len(vocab), hidden_size=args.hidden, num_hidden_layers=args.layers,
        num_attention_heads=args.heads, intermediate_size=4 * args.hidden,
        max_position_embeddings=512, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        pad_token_id=0)
    cfg.save_pretrained(args.output)
    torch.manual_seed(args.seed)
    bert = transformers.BertModel(cfg).eval()
    torch.save(bert.state_dict(), os.path.join(args.output, "pytorch_model.bin"))
    print(f"wrote demo LM (vocab={len(vocab)}, hidden={args.hidden}, "
          f"layers={args.layers}) to {args.output}/")


if __name__ == "__main__":
    ap = ArgumentParser()
    ap.add_argument("--output", required=True)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.parse_args()
    main(ap.parse_args())
