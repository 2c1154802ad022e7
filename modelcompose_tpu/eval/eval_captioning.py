"""Caption metrics: BLEU-1..4, METEOR, ROUGE-L and CIDEr-D, self-contained.

Plays the role of the reference's pycocoevalcap-based scorer (reference:
modelcompose/eval/eval_captioning.py:1-16) — that package is not in this
image, so the standard formulas are implemented directly: corpus BLEU with
brevity penalty (uniform weights), ROUGE-L exactly as pycocoevalcap's
pure-python scorer (LCS F-measure, beta=1.2, max over references, corpus
mean), METEOR with the classic exact-match formula (alpha=0.9 F-mean,
0.5*(chunks/matches)^3 fragmentation penalty — pycocoevalcap shells out to
the METEOR Java jar with synonym/stem modules, so values are comparable
but not bit-identical), and CIDEr-D (n-gram TF-IDF cosine with length
gaussian penalty, sigma=6, n=1..4).

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
    """Corpus BLEU-1..max_n with brevity penalty."""
    bleu = []
    hyp_len = sum(len(h) for h in hypotheses)
    ref_len = 0
    for h, refs in zip(hypotheses, references):
        ref_len += min((abs(len(r) - len(h)), len(r)) for r in refs)[1]
    bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len /
                                                max(hyp_len, 1))
    log_precisions = []
    for n in range(1, max_n + 1):
        match, total = 0, 0
        for h, refs in zip(hypotheses, references):
            h_ng = _ngrams(h, n)
            max_ref = Counter()
            for r in refs:
                for ng, c in _ngrams(r, n).items():
                    max_ref[ng] = max(max_ref[ng], c)
            match += sum(min(c, max_ref[ng]) for ng, c in h_ng.items())
            total += max(sum(h_ng.values()), 0)
        p = match / max(total, 1)
        log_precisions.append(math.log(max(p, 1e-12)))
        bleu.append(bp * math.exp(sum(log_precisions) / n))
    return bleu


def cider_d(hypotheses: List[List[str]], references: List[List[List[str]]],
            max_n: int = 4, sigma: float = 6.0) -> float:
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

    def tfidf_vec(tokens, n):
        vec = defaultdict(float)
        counts = _ngrams(tokens, n + 1)
        length = max(sum(counts.values()), 1)
        norm = 0.0
        for ng, c in counts.items():
            idf = math.log(max(num_docs, 1)) - math.log(max(df[n][ng], 1.0))
            v = (c / length) * idf
            vec[ng] = v
            norm += v * v
        return vec, math.sqrt(norm)

    scores = []
    for h, refs in zip(hypotheses, references):
        score_n = []
        for n in range(max_n):
            hv, hn = tfidf_vec(h, n)
            sim = 0.0
            for r in refs:
                rv, rn = tfidf_vec(r, n)
                # clipped dot product (CIDEr-D)
                dot = sum(min(hv[ng], rv[ng]) * rv[ng] for ng in hv)
                delta = len(h) - len(r)
                penalty = math.exp(-(delta ** 2) / (2 * sigma ** 2))
                if hn > 0 and rn > 0:
                    sim += penalty * dot / (hn * rn)
            score_n.append(10.0 * sim / max(len(refs), 1))
        scores.append(sum(score_n) / max_n)
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


def meteor(hypotheses: List[List[str]],
           references: List[List[List[str]]]) -> float:
    """Corpus METEOR: per sample the max over references, averaged."""
    scores = []
    for h, refs in zip(hypotheses, references):
        scores.append(max((_meteor_single(h, r) for r in refs),
                          default=0.0))
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
