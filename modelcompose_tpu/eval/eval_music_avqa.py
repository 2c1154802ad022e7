"""MUSIC-AVQA scorer: EvalAI-normalized exact match
(reference: modelcompose/eval/eval_music_avqa.py:27-32)."""

import argparse
import json

from .m4c_evaluator import EvalAIAnswerProcessor


def calculate_accuracy(answers_file: str, output_file: str,
                       verbose: bool = True) -> float:
    processor = EvalAIAnswerProcessor()
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
            ref = processor(answers_by_id[qid])
            out = processor(item["text"])
            if verbose:
                print(ref, out)
            if ref == out:
                correct += 1
    accuracy = (correct / total) * 100 if total > 0 else 0
    print(f"Accuracy: {accuracy:.2f}%")
    return accuracy


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--answers", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()
    calculate_accuracy(args.answers, args.output)


if __name__ == "__main__":
    main()
