"""Answer-jsonl format converters for downstream scorers.

Rebuild of the reference's ``convert_mm_output_to_coco.py`` and
``convert_mm_output_to_pointllm.py`` (reference: modelcompose/eval/): turn
our answer jsonl into the COCO-caption list format or the PointLLM
GPT-judge input format.

Usage:
  python -m modelcompose_tpu.eval.convert_outputs coco \
      --input-file a.jsonl --output-file coco.json
  python -m modelcompose_tpu.eval.convert_outputs pointllm \
      --input-file a.jsonl --ann-file objaverse.json --output-file p.json
"""

from __future__ import annotations

import argparse
import json


def to_coco(input_file: str, output_file: str) -> list:
    data_list = []
    with open(input_file) as f:
        for line in f:
            rec = json.loads(line.strip())
            data_list.append({
                "image_id": rec.get("question_id", ""),
                "id": len(data_list),
                "caption": rec.get("text", ""),
            })
    with open(output_file, "w") as f:
        json.dump(data_list, f, indent=4)
    print(f"Conversion completed. The output has been saved to "
          f"{output_file}")
    return data_list


def to_pointllm(input_file: str, ann_file: str, output_file: str,
                prompt: str = "") -> dict:
    anns_raw = json.load(open(ann_file))
    if anns_raw and "label_name" not in anns_raw[0]:
        # Objaverse: gold = second conversation turn
        anns = {x["object_id"]: x["conversations"][1]["value"]
                for x in anns_raw}
        key = "object_id"
    else:
        anns = {x.get("object_id", x.get("id")): x.get("label_name", "")
                for x in anns_raw}
        key = "object_id"
    results = {"prompt": prompt, "results": []}
    with open(input_file) as f:
        for line in f:
            rec = json.loads(line.strip())
            qid = rec.get("question_id", "")
            results["results"].append({
                key: qid,
                "ground_truth": anns.get(qid, ""),
                "model_output": rec.get("text", ""),
            })
    with open(output_file, "w") as f:
        json.dump(results, f, indent=4)
    return results


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="fmt", required=True)
    p = sub.add_parser("coco")
    p.add_argument("--input-file", required=True)
    p.add_argument("--output-file", required=True)
    p = sub.add_parser("pointllm")
    p.add_argument("--input-file", required=True)
    p.add_argument("--ann-file", required=True)
    p.add_argument("--output-file", required=True)
    p.add_argument("--prompt", default="")
    args = parser.parse_args()
    if args.fmt == "coco":
        to_coco(args.input_file, args.output_file)
    else:
        to_pointllm(args.input_file, args.ann_file, args.output_file,
                    args.prompt)


if __name__ == "__main__":
    main()
