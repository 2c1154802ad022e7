"""AVQA / MCUB choice-accuracy scorer.

Same scoring rule as the reference (reference: modelcompose/eval/
eval_avqa.py:27-33): first character of the model output vs the gold
choice letter, over chunk-concatenated answer jsonl.
"""

import argparse
import json


def calculate_accuracy(answers_file: str, output_file: str,
                       verbose: bool = True) -> float:
    with open(answers_file) as f:
        answers_data = json.load(f)
    with open(output_file) as f:
        output_data = [json.loads(line) for line in f]

    answers_by_id = {a["id"]: a["conversations"][-1]["value"]
                     for a in answers_data}
    correct = 0
    total = len(output_data)
    for item in output_data:
        qid = item["question_id"]
        if qid in answers_by_id:
            expected = answers_by_id[qid]
            got = item["text"][:1]  # [AVQA Choice]
            if verbose:
                print(expected, got)
            if expected == got:
                correct += 1
    accuracy = (correct / total) * 100 if total > 0 else 0
    print(f"Accuracy: {accuracy:.2f}%")
    return accuracy


def main():
    parser = argparse.ArgumentParser(
        description="Calculate accuracy based on answers and output.")
    parser.add_argument("--answers", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()
    calculate_accuracy(args.answers, args.output)


if __name__ == "__main__":
    main()
