"""GOLDEN parity: data/convert_sqa.py vs the reference's SQA prompt
builder (reference: scripts/convert_sqa_to_llava_base_prompt.py — no
third-party imports, loaded directly)."""

import json
import os
import sys

import pytest

from tests.reference_oracle import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not mounted")

from modelcompose_tpu.data.convert_sqa import (  # noqa: E402
    build_prompt_chatbot, convert_to_jsonl, convert_to_llava)


def _ref_builder():
    sys.path.insert(0, os.path.join(REFERENCE_ROOT, "scripts"))
    import convert_sqa_to_llava_base_prompt as ref
    return ref


PROBLEMS = {
    "p1": {"question": "What is H2O?", "hint": "Think of water.",
           "caption": "", "choices": ["water", "air", "fire"],
           "answer": 0, "lecture": "Chemistry basics.\nMolecules matter.",
           "solution": "H2O is water.", "image": None},
    "p2": {"question": "Which is heavier?", "hint": "",
           "caption": "", "choices": ["kg of steel", "kg of feathers"],
           "answer": 1, "lecture": "", "solution": "",
           "image": "image.png"},
}


@pytest.mark.parametrize("fmt", ["QCM-LEA", "QCM-A", "QCM-LEPA", "CQM-ALE",
                                 "QCML-EA", "QCMLE-A"])
def test_prompts_byte_identical(fmt):
    ref = _ref_builder()
    theirs = ref.build_prompt_chatbot(PROBLEMS, list(PROBLEMS), fmt,
                                      use_caption=False, is_test=False)
    ours = build_prompt_chatbot(PROBLEMS, list(PROBLEMS), fmt,
                                use_caption=False, is_test=False)
    assert ours == theirs, fmt
    # test-example mode too (Answer: stub)
    theirs = ref.build_prompt_chatbot(PROBLEMS, list(PROBLEMS), fmt,
                                      use_caption=False, is_test=True)
    ours = build_prompt_chatbot(PROBLEMS, list(PROBLEMS), fmt,
                                use_caption=False, is_test=True)
    assert ours == theirs, fmt


def test_convert_to_llava_and_jsonl(tmp_path):
    base = tmp_path
    json.dump({"train": list(PROBLEMS)}, open(base / "pid_splits.json",
                                              "w"))
    json.dump(PROBLEMS, open(base / "problems.json", "w"))

    recs = convert_to_llava(str(base), "train")
    assert os.path.exists(base / "llava_train_QCM-LEA.json")
    by_id = {r["id"]: r for r in recs}
    assert "image" not in by_id["p1"]
    assert by_id["p2"]["image"] == os.path.join("p2", "image.png")
    assert by_id["p2"]["conversations"][0]["value"].endswith("\n<image>")
    assert not by_id["p1"]["conversations"][0]["value"].startswith(
        "Question: ")

    rows = convert_to_jsonl(str(base), "train")
    assert os.path.exists(base / "scienceqa_train_QCM-LEPA.jsonl")
    assert rows[0]["instruction"] and "ANSWER:" in rows[0]["output"]
