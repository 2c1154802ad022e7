"""Shared fake tokenizer for tests.

Mimics the two Llama-sentencepiece properties the v1 label-masking math
relies on (see data/preprocess._mask_rounds): a BOS is prepended to every
call, and the literal "</s>" maps to the EOS id — so
``len(tok(round))`` (BOS +) cancels against the EOS each round contributes
to the full-conversation tokenization and ``cur_len`` lands on
``total_len``.
"""

import re

import numpy as np


class FakeLlamaTokenizer:
    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0
    model_max_length = 2048

    def __call__(self, text, return_tensors=None, padding=None,
                 max_length=None, truncation=None):
        ids = [self.bos_token_id]
        for part in re.split(r"(</s>)", text):
            if part == "</s>":
                ids.append(self.eos_token_id)
            elif part:
                ids.extend(3 + (hash(w) % 200) for w in part.split())
        if truncation and max_length:
            ids = ids[:max_length]

        class R:
            pass

        r = R()
        if return_tensors == "pt":  # HF _tokenize_fn-style call
            import torch
            r.input_ids = torch.tensor([ids])
        else:
            r.input_ids = ids
        return r

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{i}" for i in np.asarray(ids).tolist())
