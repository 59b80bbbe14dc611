"""HF tokenizer with word→token alignment (reference ``cube/utils/hf.py``).

Maps a word list to subtoken ids plus a `word2tok` index (the word-start '▁' subtoken
of each word; the walk can also emit one trailing sentinel entry keyed past the last
word when that word has continuation subtokens — the reference does the same and its
`_expand_i_hf` gather simply never reads it). Requires `transformers` with a *local*
model directory in network-free environments.
"""

from __future__ import annotations


class HFTokenizer:
    def __init__(self, model_name: str):
        from transformers import AutoTokenizer

        self._tok = AutoTokenizer.from_pretrained(model_name)

    def __call__(self, sentence: list[str]) -> dict:
        if len(sentence) == 0:
            return {"tok_ids": [], "toks": [], "word2tok": {}}
        orig = list(sentence)
        sentence = ["_" if w == " " else w for w in sentence]
        iid = self._tok(sentence, add_special_tokens=False,
                        is_split_into_words=True)["input_ids"]
        toks = self._tok.convert_ids_to_tokens(iid)
        # '▁' alone then token → treat token as word-started (reference hf.py:24-26)
        for i in range(1, len(toks)):
            if toks[i - 1] == "▁":
                toks[i] = "▁" + toks[i]
        word2tok = {}
        tok_ids = []
        it, iw = 0, 0
        while it < len(toks) or iw < len(orig):
            while it < len(toks) and (
                    toks[it].replace("▁", "").replace("_", "") == "" or
                    not toks[it].startswith("▁")):
                if toks[it].replace("▁", "").replace("_", "") != "":
                    tok_ids.append(iid[it])
                it += 1
            while iw < len(orig) and orig[iw] == " ":
                iw += 1
            if it < len(iid):
                tok_ids.append(iid[it])
            word2tok[iw] = len(tok_ids) - 1
            it += 1
            iw += 1
        return {"toks": self._tok.convert_ids_to_tokens(tok_ids),
                "tok_ids": tok_ids, "word2tok": word2tok}
