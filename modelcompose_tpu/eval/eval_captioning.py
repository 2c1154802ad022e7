"""Caption metrics: BLEU-1..4, METEOR, ROUGE-L and CIDEr-D, self-contained.

Plays the role of the reference's pycocoevalcap-based scorer (reference:
modelcompose/eval/eval_captioning.py:1-16) — that package is not in this
image.  BLEU (closest-reflen corpus scorer), ROUGE-L (LCS F-measure,
beta=1.2, max over references) and CIDEr-D (raw-tf idf vectors, clipped
cosine, gaussian length penalty sigma=6) implement pycocoevalcap's
algorithms EXACTLY — tests/test_captioning_pycoco_exact.py holds
independent transcriptions of its scorers and asserts bitwise agreement
on randomized corpora.  METEOR is a documented approximation: the classic
exact-match formula by default; ``params="1.5"`` applies the meteor-1.5
jar's en constants with the exact+stem matcher modules (Snowball English
stemming, module weights 1.0/0.6 — two of the jar's four modules); the
jar's synonym/paraphrase modules (WordNet + paraphrase-en data, absent
from this image) and SPICE (Java) are excluded — see BASELINE.md
"Captioning metric fidelity".  Tokenization: ``--tokenizer simple``
(lowercase/punct-strip, historical default) or ``--tokenizer ptb``
(nltk Treebank tokenizer — a Penn-Treebank-rules port — lowercased, plus
pycocoevalcap's punctuation-token removal, the PTB-equivalent pipeline).

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


# pycocoevalcap's PTBTokenizer removes exactly these tokens AFTER the
# Stanford tokenizer runs (ptbtokenizer.py PUNCTUATIONS — protocol
# constants, same in the reference's dependency).
_PTB_PUNCTUATIONS = frozenset([
    "''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
    ".", "?", "!", ",", ":", "-", "--", "...", ";"])
_PTB_TOKENIZER = None


def ptb_tokenize(text: str) -> List[str]:
    """PTB-equivalent caption tokenization, pure Python: nltk's
    TreebankWordTokenizer (a port of the same Penn Treebank sed script
    the Stanford tokenizer descends from, parenthesis conversion on to
    mirror -LRB-/-RRB-), lowercased, then pycocoevalcap's punctuation
    token removal.  Splits contractions/possessives the way the jar
    pipeline does ("isn't" -> "is" "n't", "man's" -> "man" "'s"), which
    the simple tokenizer does not."""
    global _PTB_TOKENIZER
    if _PTB_TOKENIZER is None:
        from nltk.tokenize.treebank import TreebankWordTokenizer
        _PTB_TOKENIZER = TreebankWordTokenizer()
    toks = _PTB_TOKENIZER.tokenize(text.lower(), convert_parentheses=True)
    return [t for t in toks if t not in _PTB_PUNCTUATIONS]


TOKENIZERS = {"simple": _tokenize, "ptb": ptb_tokenize}


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


def _stem_en(word: str) -> str:
    """Snowball English stem (the meteor-1.5 jar's en stemmer is
    org.tartarus.snowball englishStemmer — same algorithm family); nltk's
    implementation is pure Python, no corpus data required."""
    global _STEMMER
    if _STEMMER is None:
        from nltk.stem.snowball import SnowballStemmer
        _STEMMER = SnowballStemmer("english")
    return _STEMMER.stem(word)


_STEMMER = None

# METEOR matcher stages as (key_fn, module_weight) in jar application
# order.  Module weights are meteor-1.5's en tuning (exact 1.0, stem 0.6);
# synonym (0.8) and paraphrase (0.6) need the jar's WordNet/paraphrase-en
# data files, which do not exist in this image — the stage list is where
# they would slot in.
_STAGES_EXACT = ((None, 1.0),)
_STAGES_STEM = ((None, 1.0), (_stem_en, 0.6))


def _meteor_align(h: List[str], r: List[str], stages):
    """Stage-ordered one-to-one alignment.  Later stages only see words
    left unmatched by earlier ones (meteor Aligner stage semantics).
    Within a stage, a hypothesis word prefers the reference slot that
    extends the chunk begun by the previous aligned pair, else the
    leftmost free slot — a deterministic approximation of the jar's
    maximize-matches-then-minimize-chunks beam search."""
    align: Dict[int, tuple] = {}  # hyp_idx -> (ref_idx, module_weight)
    used_r = set()
    for key_fn, weight in stages:
        key = key_fn if key_fn is not None else lambda w: w
        r_slots: Dict[str, List[int]] = defaultdict(list)
        for j, w in enumerate(r):
            if j not in used_r:
                r_slots[key(w)].append(j)
        for i, w in enumerate(h):
            if i in align:
                continue
            slots = [j for j in r_slots.get(key(w), ()) if j not in used_r]
            if not slots:
                continue
            prev = align.get(i - 1)
            j = prev[0] + 1 if prev and prev[0] + 1 in slots else slots[0]
            align[i] = (j, weight)
            used_r.add(j)
    return sorted((i, j, w) for i, (j, w) in align.items())


def _meteor_single(h: List[str], r: List[str],
                   alpha: float = 0.9, beta: float = 3.0,
                   gamma: float = 0.5, stages=_STAGES_EXACT) -> float:
    """METEOR sentence score: stage-aligned unigram matches, harmonic
    F-mean over module-weighted precision/recall (recall-weighted by
    alpha), fragmentation penalty gamma*(chunks/matches)^beta computed on
    UNweighted match counts (meteor Stats semantics)."""
    if not h or not r:
        return 0.0
    align = _meteor_align(h, r, stages)
    m = len(align)
    if m == 0:
        return 0.0
    weighted = sum(w for _, _, w in align)
    prec = weighted / len(h)
    rec = weighted / len(r)
    f_mean = prec * rec / (alpha * prec + (1 - alpha) * rec)
    chunks = 1
    for (pi, pj, _), (ci, cj, _) in zip(align, align[1:]):
        if ci != pi + 1 or cj != pj + 1:
            chunks += 1
    penalty = gamma * (chunks / m) ** beta
    return f_mean * (1 - penalty)


# METEOR parameterizations: "1.0" = the classic paper formula this module
# defaults to; "1.5-exact" = the meteor-1.5 jar's tuned en parameters
# (alpha 0.85, beta 0.2, gamma 0.6) restricted to the EXACT matcher
# module; "1.5" adds the stem module (Snowball English, weight 0.6 — two
# of the jar's four en modules).  The jar's synonym/paraphrase matchers
# and function-word discounting (delta) need its WordNet/paraphrase-en/
# function-word resources, absent from this image, so values here remain
# documented approximations; tests/test_captioning_pycoco_exact.py pins
# the numeric divergence between parameterizations on a seeded corpus.
# With no function-word list every word carries the same word weight,
# which cancels from P and R — equivalent to the jar with an empty
# function.words file.
# NOTE (round 5): the staged aligner's chunk-extending slot preference
# applies to ALL parameterizations, so '1.0' scores on repeated-word
# sentences can differ slightly from earlier rounds (fewer chunks =
# closer to the jar's chunk-minimizing search; the seeded-corpus
# divergence bounds in tests/test_captioning_pycoco_exact.py still hold).
METEOR_PARAMS = {"1.0": (0.9, 3.0, 0.5, _STAGES_EXACT),
                 "1.5-exact": (0.85, 0.2, 0.6, _STAGES_EXACT),
                 "1.5": (0.85, 0.2, 0.6, _STAGES_STEM)}


def meteor(hypotheses: List[List[str]],
           references: List[List[List[str]]],
           params: str = "1.0") -> float:
    """Corpus METEOR: per sample the max over references, averaged."""
    alpha, beta, gamma, stages = METEOR_PARAMS[params]
    scores = []
    for h, refs in zip(hypotheses, references):
        scores.append(max((_meteor_single(h, r, alpha, beta, gamma, stages)
                           for r in refs), default=0.0))
    return sum(scores) / max(len(scores), 1)


def evaluate_captions(result_file: str, annotation_file: str,
                      verbose: bool = True, tokenizer: str = "simple",
                      meteor_params: str = "1.0") -> Dict[str, float]:
    tok = TOKENIZERS[tokenizer]
    results = [json.loads(l) for l in open(result_file)]
    ann = json.load(open(annotation_file))
    refs_by_image = defaultdict(list)
    for a in ann["annotations"]:
        refs_by_image[a["image_id"]].append(tok(a["caption"]))

    hyps, refs = [], []
    for r in results:
        image_id = r["question_id"]
        if image_id in refs_by_image:
            hyps.append(tok(r["text"]))
            refs.append(refs_by_image[image_id])
    bleu = corpus_bleu(hyps, refs)
    cider = cider_d(hyps, refs)
    out = {f"BLEU-{i + 1}": round(b, 4) for i, b in enumerate(bleu)}
    out["METEOR"] = round(meteor(hyps, refs, params=meteor_params), 4)
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
    parser.add_argument("--tokenizer", choices=sorted(TOKENIZERS),
                        default="simple",
                        help="'ptb' = PTB-equivalent pipeline (Treebank "
                             "tokenizer + pycocoevalcap punctuation "
                             "removal); 'simple' = lowercase/punct-strip "
                             "(the historical default)")
    parser.add_argument("--meteor-params", choices=sorted(METEOR_PARAMS),
                        default="1.0",
                        help="'1.5' = jar en constants with exact+stem "
                             "modules; '1.5-exact'/'1.0' = exact module "
                             "only")
    args = parser.parse_args()
    evaluate_captions(args.result_file, args.annotation_file,
                      tokenizer=args.tokenizer,
                      meteor_params=args.meteor_params)


if __name__ == "__main__":
    main()
