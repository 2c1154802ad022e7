"""Review webpage: static viewer for GPT-judge pairwise evaluations.

Rebuild of the reference's webpage tooling (reference:
modelcompose/eval/generate_webpage_data_from_table.py and
modelcompose/eval/webpage/{index.html,script.js,styles.css}): build the
same ``data.json`` record schema from question/answer/review jsonl files,
then render a SELF-CONTAINED single-file viewer (inline CSS/JS, no CDN —
works in a zero-egress environment) with category/question selectors,
side-by-side answers, judge commentary and score bars.

Usage:
  python -m modelcompose_tpu.eval.webpage \
      --question table/question.jsonl \
      --answer vicuna=table/answer/answer_vicuna-13b.jsonl \
      --answer ours=table/results/ours.jsonl \
      --review vicuna=table/review/review_vicuna_ours.jsonl \
      --output-dir webpage
"""

from __future__ import annotations

import argparse
import json
import os
import re
from typing import Dict, List


def read_jsonl(path: str, key: str = None):
    """reference: generate_webpage_data_from_table.py:10-20."""
    data = []
    with open(os.path.expanduser(path)) as f:
        for line in f:
            if line.strip():
                data.append(json.loads(line))
    if key is not None:
        data.sort(key=lambda x: x[key])
        return {item[key]: item for item in data}
    return data


def clean_evaluation(text: str) -> str:
    """Trim the leading 'x, y' score pair line and bold the assistant
    labels (reference: :78-88)."""
    lines = text.strip().split("\n")
    if lines and re.match(r"\d+[, ]+\d+", lines[0]):
        lines = lines[1:]
    return "\n".join(lines).replace(
        "Assistant 1", "**Assistant 1**").replace(
        "Assistant 2", "**Assistant 2**")


def build_webpage_data(question_file: str,
                       answer_files: Dict[str, str],
                       review_files: Dict[str, str],
                       ours_key: str = "ours") -> Dict:
    """Same record schema as the reference's data.json: per question
    {id, category, question, answers{model: text},
    evaluations{model: judge text}, scores{model: [other, ours]}}."""
    questions = read_jsonl(question_file, key="question_id")
    answers = {m: read_jsonl(p, key="question_id")
               for m, p in answer_files.items()}
    reviews = {m: read_jsonl(p, key="question_id")
               for m, p in review_files.items()}

    records: List[Dict] = []
    for qid, q in questions.items():
        r = {
            "id": qid,
            "category": q.get("category", "all"),
            "question": q["text"],
            "answers": {m: a[qid]["text"] for m, a in answers.items()
                        if qid in a},
            "evaluations": {
                m: clean_evaluation(
                    rv[qid].get("content") or rv[qid].get("review", ""))
                for m, rv in reviews.items() if qid in rv},
            "scores": {
                m: rv[qid].get("tuple") or rv[qid].get("scores", [-1, -1])
                for m, rv in reviews.items() if qid in rv},
        }
        records.append(r)
    records.sort(key=lambda x: x["id"])
    models = [m for m in answer_files if m != ours_key]
    return {"questions": records, "models": models}


_PAGE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="UTF-8">
<title>GPT-judge evaluation examples</title>
<style>
body {{ font-family: system-ui, sans-serif; margin: 0; background: #f6f7f9; color: #1c2024; }}
nav {{ background: #1c2024; color: #fff; padding: 0.8rem 1.2rem; font-weight: 600; }}
.wrap {{ max-width: 960px; margin: 1.5rem auto; padding: 0 1rem; }}
.controls {{ display: flex; gap: 0.6rem; margin-bottom: 1rem; }}
select, button {{ padding: 0.4rem 0.6rem; font-size: 0.95rem; }}
select {{ flex: 1; }}
.card {{ background: #fff; border: 1px solid #dde1e6; border-radius: 8px; padding: 1rem 1.2rem; margin-bottom: 1rem; }}
.card h3 {{ margin: 0 0 0.5rem; font-size: 1rem; color: #444; }}
.answer {{ white-space: pre-wrap; }}
.scorebar {{ height: 10px; border-radius: 5px; background: #dde1e6; position: relative; margin: 0.3rem 0 0.8rem; }}
.scorebar > div {{ height: 100%; border-radius: 5px; background: #4a7dca; }}
.scores {{ font-size: 0.9rem; color: #555; }}
</style>
</head>
<body>
<nav>GPT-judge evaluation examples</nav>
<div class="wrap">
  <div class="controls">
    <select id="model"></select>
    <select id="category"></select>
    <select id="question"></select>
    <button id="prev">&#8592;</button>
    <button id="next">&#8594;</button>
  </div>
  <div class="card"><h3>Question</h3><div class="answer" id="q-text"></div></div>
  <div class="card"><h3 id="other-name"></h3><div class="answer" id="other-answer"></div></div>
  <div class="card"><h3>Ours</h3><div class="answer" id="ours-answer"></div></div>
  <div class="card"><h3>Judge</h3>
    <div class="scores" id="score-line"></div>
    <div class="scorebar"><div id="score-fill" style="width:50%"></div></div>
    <div class="answer" id="judge-text"></div>
  </div>
</div>
<script>
const DATA = {data_json};
const OURS = {ours_key_json};
const cats = [...new Set(DATA.questions.map(q => q.category))];
const catSel = document.getElementById('category');
const qSel = document.getElementById('question');
const modelSel = document.getElementById('model');
DATA.models.forEach(m => modelSel.add(new Option(m + ' vs ours', m)));
cats.forEach(c => catSel.add(new Option(c, c)));
function fillQuestions() {{
  qSel.innerHTML = '';
  DATA.questions.filter(q => q.category === catSel.value)
    .forEach(q => qSel.add(new Option('Q' + q.id + ': ' + q.question.slice(0, 80), q.id)));
  render();
}}
function render() {{
  const q = DATA.questions.find(x => String(x.id) === String(qSel.value));
  if (!q) return;
  const other = modelSel.value || DATA.models[0];
  document.getElementById('q-text').textContent = q.question;
  document.getElementById('other-name').textContent = other;
  document.getElementById('other-answer').textContent = q.answers[other] || '';
  document.getElementById('ours-answer').textContent = q.answers[OURS] || '';
  document.getElementById('judge-text').textContent = (q.evaluations[other] || '');
  const s = q.scores[other] || [-1, -1];
  document.getElementById('score-line').textContent = other + ': ' + s[0] + ' / ours: ' + s[1];
  const total = (Number(s[0]) + Number(s[1])) || 1;
  document.getElementById('score-fill').style.width = (100 * Number(s[1]) / total) + '%';
}}
function step(d) {{
  const i = qSel.selectedIndex + d;
  if (i >= 0 && i < qSel.length) {{ qSel.selectedIndex = i; render(); }}
}}
modelSel.onchange = render;
catSel.onchange = fillQuestions;
qSel.onchange = render;
document.getElementById('prev').onclick = () => step(-1);
document.getElementById('next').onclick = () => step(1);
fillQuestions();
</script>
</body>
</html>
"""


def render_webpage(data: Dict, output_dir: str,
                   ours_key: str = "ours") -> str:
    """Write data.json (the reference's artifact) + a self-contained
    index.html embedding the records.  Returns the index path."""
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "data.json"), "w") as f:
        json.dump(data, f, indent=2)
    # escape '</' so model/judge text containing '</script>' cannot
    # terminate the inline script or inject HTML
    page = _PAGE.format(
        data_json=json.dumps(data).replace("</", "<\\/"),
        ours_key_json=json.dumps(ours_key))
    index = os.path.join(output_dir, "index.html")
    with open(index, "w") as f:
        f.write(page)
    return index


def _kv(pair: str):
    name, _, path = pair.partition("=")
    if not path:
        raise argparse.ArgumentTypeError(
            f"expected model=path, got {pair!r}")
    return name, path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--question", required=True)
    parser.add_argument("--answer", type=_kv, action="append", required=True,
                        metavar="MODEL=PATH")
    parser.add_argument("--review", type=_kv, action="append", required=True,
                        metavar="MODEL=PATH")
    parser.add_argument("--ours-key", default="ours")
    parser.add_argument("--output-dir", default="webpage")
    args = parser.parse_args()
    data = build_webpage_data(args.question, dict(args.answer),
                              dict(args.review), args.ours_key)
    index = render_webpage(data, args.output_dir, args.ours_key)
    print(f"wrote {index} ({len(data['questions'])} questions)")


if __name__ == "__main__":
    main()
