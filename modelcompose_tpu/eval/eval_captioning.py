"""Caption metrics: BLEU-1..4, METEOR, ROUGE-L and CIDEr-D, self-contained.

Plays the role of the reference's pycocoevalcap-based scorer (reference:
modelcompose/eval/eval_captioning.py:1-16) — that package is not in this
image.  BLEU (closest-reflen corpus scorer), ROUGE-L (LCS F-measure,
beta=1.2, max over references) and CIDEr-D (raw-tf idf vectors, clipped
cosine, gaussian length penalty sigma=6) implement pycocoevalcap's
algorithms EXACTLY — tests/test_captioning_pycoco_exact.py holds
independent transcriptions of its scorers and asserts bitwise agreement
on randomized corpora.  METEOR is a documented approximation: the classic
exact-match formula by default, with a ``params="1.5-exact"``
parameterization matching the meteor-1.5 jar's en constants; the jar's
stem/synonym/paraphrase modules and SPICE (both Java) are excluded —
see BASELINE.md "Captioning metric fidelity".  Tokenization is a simple
lowercase/punct-strip standing in for the PTBTokenizer jar.

Inputs follow the reference's format: results jsonl with
``{"question_id", "text"}`` and a COCO-style annotation json with
``annotations: [{"image_id", "caption"}]``.
"""

from __future__ import annotations

import argparse
import json
import math
from collections import Counter, defaultdict
from typing import Dict, List


def _tokenize(text: str) -> List[str]:
    out = []
    for ch in text.lower():
        out.append(ch if ch.isalnum() or ch.isspace() else " ")
    return "".join(out).split()


def _ngrams(tokens: List[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in
                   range(len(tokens) - n + 1))


def corpus_bleu(hypotheses: List[List[str]], references: List[List[List[str]]],
                max_n: int = 4) -> List[float]:
    """Corpus BLEU-1..max_n, pycocoevalcap-exact: the 'closest' effective
    reference length (ties -> shorter), cumulative clipped-precision
    product with the +1e-15/+1e-9 numerator/denominator guards,
    brevity penalty
    exp(1 - 1/ratio) when ratio < 1 (pycocoevalcap bleu_scorer semantics,
    tested exact against an independent transcription in
    tests/test_captioning_pycoco_exact.py)."""
    hyp_len = sum(len(h) for h in hypotheses)
    ref_len = 0
    for h, refs in zip(hypotheses, references):
        ref_len += min((abs(len(r) - len(h)), len(r)) for r in refs)[1]

    bleu, product = [], 1.0
    for n in range(1, max_n + 1):
        correct, guess = 0, 0
        for h, refs in zip(hypotheses, references):
            h_ng = _ngrams(h, n)
            max_ref = Counter()
            for r in refs:
                for ng, c in _ngrams(r, n).items():
                    max_ref[ng] = max(max_ref[ng], c)
            correct += sum(min(c, max_ref[ng]) for ng, c in h_ng.items())
            guess += max(len(h) - n + 1, 0)
        product *= (float(correct) + 1e-15) / (float(guess) + 1e-9)
        bleu.append(product ** (1.0 / n))
    ratio = hyp_len / (ref_len + 1e-9)
    if ratio < 1:
        bp = math.exp(1 - 1 / ratio) if ratio > 0 else 0.0
        bleu = [b * bp for b in bleu]
    return bleu


def cider_d(hypotheses: List[List[str]], references: List[List[List[str]]],
            max_n: int = 4, sigma: float = 6.0) -> float:
    """CIDEr-D, pycocoevalcap-exact: RAW term-frequency x idf vectors
    (clipping min(hyp, ref) is scale-sensitive, so tf must not be
    length-normalized), idf = log(N) - log(max(df, 1)) over reference
    sets, clipped dot / norms, gaussian length penalty sigma=6, summed
    over refs then /len(refs), mean over n, x10 (pycocoevalcap
    cider_scorer semantics, tested exact against an independent
    transcription in tests/test_captioning_pycoco_exact.py)."""
    num_docs = len(references)
    # document frequency over reference n-grams
    df = [defaultdict(float) for _ in range(max_n)]
    for refs in references:
        for n in range(max_n):
            seen = set()
            for r in refs:
                seen.update(_ngrams(r, n + 1).keys())
            for ng in seen:
                df[n][ng] += 1.0

    log_n = math.log(max(num_docs, 1))

    def tfidf_vec(tokens, n):
        vec = defaultdict(float)
        norm = 0.0
        for ng, c in _ngrams(tokens, n + 1).items():
            v = float(c) * (log_n - math.log(max(df[n][ng], 1.0)))
            vec[ng] = v
            norm += v * v
        return vec, math.sqrt(norm)

    scores = []
    for h, refs in zip(hypotheses, references):
        score_n = [0.0] * max_n
        hvs = [tfidf_vec(h, n) for n in range(max_n)]
        for r in refs:
            delta = float(len(h) - len(r))
            penalty = math.exp(-(delta ** 2) / (2 * sigma ** 2))
            for n in range(max_n):
                hv, hn = hvs[n]
                rv, rn = tfidf_vec(r, n)
                dot = sum(min(hv[ng], rv[ng]) * rv[ng] for ng in hv)
                if hn > 0 and rn > 0:
                    score_n[n] += penalty * dot / (hn * rn)
        scores.append(10.0 * sum(score_n) / max_n / max(len(refs), 1))
    return sum(scores) / max(len(scores), 1)


def _lcs_len(a: List[str], b: List[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def rouge_l(hypotheses: List[List[str]],
            references: List[List[List[str]]], beta: float = 1.2) -> float:
    """Corpus ROUGE-L: per sample the MAX LCS F-measure over references
    (pycocoevalcap rouge.py algorithm, beta=1.2), averaged."""
    scores = []
    for h, refs in zip(hypotheses, references):
        best = 0.0
        for r in refs:
            lcs = _lcs_len(h, r)
            prec = lcs / max(len(h), 1)
            rec = lcs / max(len(r), 1)
            if prec > 0 and rec > 0:
                best = max(best, ((1 + beta ** 2) * prec * rec)
                           / (rec + beta ** 2 * prec))
        scores.append(best)
    return sum(scores) / max(len(scores), 1)


def _meteor_single(h: List[str], r: List[str],
                   alpha: float = 0.9, beta: float = 3.0,
                   gamma: float = 0.5) -> float:
    """Classic METEOR with exact unigram matching: greedy left-to-right
    alignment, harmonic F-mean (recall-weighted by alpha), fragmentation
    penalty gamma*(chunks/matches)^beta."""
    if not h or not r:
        return 0.0
    ref_slots: Dict[str, List[int]] = defaultdict(list)
    for j, w in enumerate(r):
        ref_slots[w].append(j)
    align = []  # (hyp_idx, ref_idx)
    used = set()
    for i, w in enumerate(h):
        for j in ref_slots.get(w, ()):
            if j not in used:
                align.append((i, j))
                used.add(j)
                break
    m = len(align)
    if m == 0:
        return 0.0
    prec = m / len(h)
    rec = m / len(r)
    f_mean = prec * rec / (alpha * prec + (1 - alpha) * rec)
    chunks = 1
    for (pi, pj), (ci, cj) in zip(align, align[1:]):
        if ci != pi + 1 or cj != pj + 1:
            chunks += 1
    penalty = gamma * (chunks / m) ** beta
    return f_mean * (1 - penalty)


# METEOR parameterizations: "1.0" = the classic paper formula this module
# defaults to; "1.5-exact" = the meteor-1.5 jar's tuned en parameters
# (alpha 0.85, beta 0.2, gamma 0.6) restricted to the EXACT matcher module.
# The jar pycocoevalcap shells out to additionally applies stem/synonym/
# paraphrase matchers and function-word discounting (delta) — not
# reproducible without its Java resources, so values here are documented
# approximations; tests/test_captioning_pycoco_exact.py pins the numeric
# divergence between the two parameterizations on a seeded corpus.
METEOR_PARAMS = {"1.0": (0.9, 3.0, 0.5), "1.5-exact": (0.85, 0.2, 0.6)}


def meteor(hypotheses: List[List[str]],
           references: List[List[List[str]]],
           params: str = "1.0") -> float:
    """Corpus METEOR: per sample the max over references, averaged."""
    alpha, beta, gamma = METEOR_PARAMS[params]
    scores = []
    for h, refs in zip(hypotheses, references):
        scores.append(max((_meteor_single(h, r, alpha, beta, gamma)
                           for r in refs), default=0.0))
    return sum(scores) / max(len(scores), 1)


def evaluate_captions(result_file: str, annotation_file: str,
                      verbose: bool = True) -> Dict[str, float]:
    results = [json.loads(l) for l in open(result_file)]
    ann = json.load(open(annotation_file))
    refs_by_image = defaultdict(list)
    for a in ann["annotations"]:
        refs_by_image[a["image_id"]].append(_tokenize(a["caption"]))

    hyps, refs = [], []
    for r in results:
        image_id = r["question_id"]
        if image_id in refs_by_image:
            hyps.append(_tokenize(r["text"]))
            refs.append(refs_by_image[image_id])
    bleu = corpus_bleu(hyps, refs)
    cider = cider_d(hyps, refs)
    out = {f"BLEU-{i + 1}": round(b, 4) for i, b in enumerate(bleu)}
    out["METEOR"] = round(meteor(hyps, refs), 4)
    out["ROUGE-L"] = round(rouge_l(hyps, refs), 4)
    out["CIDEr-D"] = round(cider, 4)
    if verbose:
        for k, v in out.items():
            print(f"{k}: {v}")
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--result-file", required=True)
    parser.add_argument("--annotation-file", required=True)
    args = parser.parse_args()
    evaluate_captions(args.result_file, args.annotation_file)


if __name__ == "__main__":
    main()
