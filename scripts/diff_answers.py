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


def load(path, field):
    """Returns (rows-by-id, problem-list).  Duplicate ids with DIFFERENT
    answers and rows missing any id are reported as problems — silently
    keeping the last row would let the parity gate exit 0 on files that
    differ (e.g. a re-run chunked harness that appended to a partial
    answers jsonl)."""
    rows, problems = {}, []
    with open(path) as f:
        for n, line in enumerate(f, 1):
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            qid = r.get("question_id", r.get("id"))
            if qid is None:
                problems.append(f"{path}:{n}: row has no question_id/id")
                continue
            if qid in rows and rows[qid].get(field) != r.get(field):
                problems.append(
                    f"{path}:{n}: duplicate qid={qid!r} with a DIFFERENT "
                    f"{field!r}")
            rows[qid] = r
    return rows, problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("theirs")
    ap.add_argument("--field", default="text",
                    help="answer field to compare (default: text)")
    ap.add_argument("--show", type=int, default=5,
                    help="mismatches to print")
    args = ap.parse_args()

    a, problems_a = load(args.ours, args.field)
    b, problems_b = load(args.theirs, args.field)
    problems = problems_a + problems_b
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
        "file_problems": len(problems),
    }))
    for p in problems[:args.show]:
        print(f"  PROBLEM {p}", file=sys.stderr)
    for q, va, vb in mism[:args.show]:
        print(f"  MISMATCH qid={q}\n    ours:   {va!r}\n"
              f"    theirs: {vb!r}", file=sys.stderr)
    sys.exit(0 if not mism and not only_a and not only_b and not problems
             else 1)


if __name__ == "__main__":
    main()
