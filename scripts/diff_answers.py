"""Diff two answers-jsonl files answer-for-answer (the parity gate,
BASELINE.md gate #4: IDENTICAL AVQA/MCUB-4 answers, not just scores).

Aligns rows on question_id (the chunked harness may emit them in chunk
order) and reports identical/total plus the first mismatches.

Usage: python scripts/diff_answers.py ours.jsonl theirs.jsonl [--field text]
Exit code 0 iff all aligned answers match and the id sets are equal.
"""

import argparse
import json
import sys


def load(path):
    rows = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            rows[r.get("question_id", r.get("id"))] = r
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("theirs")
    ap.add_argument("--field", default="text",
                    help="answer field to compare (default: text)")
    ap.add_argument("--show", type=int, default=5,
                    help="mismatches to print")
    args = ap.parse_args()

    a, b = load(args.ours), load(args.theirs)
    only_a = sorted(set(a) - set(b))
    only_b = sorted(set(b) - set(a))
    shared = sorted(set(a) & set(b))
    mism = [(q, a[q].get(args.field), b[q].get(args.field))
            for q in shared if a[q].get(args.field) != b[q].get(args.field)]

    print(json.dumps({
        "total_ours": len(a), "total_theirs": len(b),
        "shared": len(shared), "identical": len(shared) - len(mism),
        "mismatched": len(mism),
        "only_in_ours": len(only_a), "only_in_theirs": len(only_b),
    }))
    for q, va, vb in mism[:args.show]:
        print(f"  MISMATCH qid={q}\n    ours:   {va!r}\n"
              f"    theirs: {vb!r}", file=sys.stderr)
    sys.exit(0 if not mism and not only_a and not only_b else 1)


if __name__ == "__main__":
    main()
