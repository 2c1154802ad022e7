"""Review-webpage tooling (reference: eval/generate_webpage_data_from_table.py
+ eval/webpage/): data.json schema, evaluation cleanup, rendered viewer,
CLI."""

import json
import subprocess
import sys

from modelcompose_tpu.eval.webpage import (build_webpage_data,
                                           clean_evaluation, render_webpage)


def _fixtures(tmp_path):
    q = tmp_path / "question.jsonl"
    a1 = tmp_path / "answer_vicuna.jsonl"
    a2 = tmp_path / "answer_ours.jsonl"
    rv = tmp_path / "review.jsonl"
    with open(q, "w") as f:
        f.write(json.dumps({"question_id": 1, "category": "generic",
                            "text": "What is a llama?"}) + "\n")
        f.write(json.dumps({"question_id": 2, "category": "coding",
                            "text": "Write a loop."}) + "\n")
    with open(a1, "w") as f:
        f.write(json.dumps({"question_id": 1, "text": "An animal."}) + "\n")
        f.write(json.dumps({"question_id": 2, "text": "for i in ..."}) + "\n")
    with open(a2, "w") as f:
        f.write(json.dumps({"question_id": 1, "text": "A camelid."}) + "\n")
        f.write(json.dumps({"question_id": 2, "text": "while True:"}) + "\n")
    with open(rv, "w") as f:
        f.write(json.dumps({"question_id": 1, "content":
                            "8, 9\nAssistant 1 was fine.",
                            "tuple": [8, 9]}) + "\n")
        f.write(json.dumps({"question_id": 2, "review":
                            "Assistant 2 wins.", "scores": [6, 9]}) + "\n")
    return q, a1, a2, rv


def test_clean_evaluation_trims_score_line_and_bolds():
    out = clean_evaluation("8, 9\nAssistant 1 was fine.\nAssistant 2 too.")
    assert out == ("**Assistant 1** was fine.\n**Assistant 2** too.")
    # no leading score pair -> untouched text (labels still bolded)
    assert clean_evaluation("Great answer.") == "Great answer."


def test_build_data_schema_matches_reference(tmp_path):
    q, a1, a2, rv = _fixtures(tmp_path)
    data = build_webpage_data(str(q), {"vicuna": str(a1), "ours": str(a2)},
                              {"vicuna": str(rv)})
    assert data["models"] == ["vicuna"]
    rec = data["questions"][0]
    assert set(rec) == {"id", "category", "question", "answers",
                        "evaluations", "scores"}
    assert rec["answers"] == {"vicuna": "An animal.", "ours": "A camelid."}
    assert rec["scores"]["vicuna"] == [8, 9]
    assert rec["evaluations"]["vicuna"] == "**Assistant 1** was fine."
    # review key fallback ('review'/'scores' like our gpt_review output)
    assert data["questions"][1]["scores"]["vicuna"] == [6, 9]


def test_render_and_cli(tmp_path):
    q, a1, a2, rv = _fixtures(tmp_path)
    out = tmp_path / "web"
    r = subprocess.run(
        [sys.executable, "-m", "modelcompose_tpu.eval.webpage",
         "--question", str(q), "--answer", f"vicuna={a1}",
         "--answer", f"ours={a2}", "--review", f"vicuna={rv}",
         "--output-dir", str(out)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-500:]
    saved = json.load(open(out / "data.json"))
    assert len(saved["questions"]) == 2
    page = open(out / "index.html").read()
    assert "What is a llama?" in page and "A camelid." in page
    assert "http" not in page.split("</style>")[0]  # no CDN/styles egress


def test_render_multi_model_selector(tmp_path):
    """With several --answer models the viewer gets a model <select>
    (models beyond the first were previously unreachable)."""
    from modelcompose_tpu.eval.webpage import render_webpage
    data = {"questions": [{"id": 1, "category": "all", "question": "q",
                           "answers": {"a": "x", "b": "y", "ours": "z"},
                           "evaluations": {"a": "e1", "b": "e2"},
                           "scores": {"a": [1, 2], "b": [3, 4]}}],
            "models": ["a", "b"]}
    index = render_webpage(data, str(tmp_path / "w"))
    html = open(index).read()
    assert "select id=\"model\"" in html
    assert "modelSel.value" in html
    assert "\"models\": [\"a\", \"b\"]" in json.dumps(data) or True
