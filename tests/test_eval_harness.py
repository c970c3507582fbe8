"""Eval-harness smoke test on a small synthetic corpus."""

import asyncio

from conftest import run_once
from pathlib import Path

import pytest

from evaluations.base_eval import EvalQuestion, MorphikTPUEvaluator
from morphik_core_tpu.config import Settings
from morphik_core_tpu.models.schemas import AuthContext
from morphik_core_tpu.services_init import build_services

_LOOP = asyncio.new_event_loop()


def run(coro):
    return _LOOP.run_until_complete(coro)


def test_eval_harness_accuracy(tmp_path):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "a.txt").write_text("The Eiffel Tower is 330 meters tall and located in Paris.")
    (corpus / "b.txt").write_text("Mount Everest has a height of 8849 meters above sea level.")

    settings = Settings.model_validate(
        {
            "storage": {"storage_path": str(tmp_path / "storage")},
            "database": {"path": str(tmp_path / "db.sqlite")},
            "morphik": {"enable_colpali": False, "colpali_mode": "off"},
        }
    )
    services = build_services(settings)
    run(services.initialize())
    auth = AuthContext(entity_id="eval", permissions={"read", "write", "admin"})

    ev = MorphikTPUEvaluator(services, auth, use_colpali=False, k=2)
    run(ev.ingest(corpus))
    questions = [
        EvalQuestion("How tall is the Eiffel Tower?", "330"),
        EvalQuestion("What is the height of Mount Everest?", "8849"),
        EvalQuestion("What color is the moon?", "THIS-WILL-NOT-MATCH"),
    ]
    summary = run(ev.run(questions, out_path=tmp_path / "eval.json"))
    assert summary["n_correct"] == 2 and summary["n_questions"] == 3
    assert (tmp_path / "eval.json").exists()
    run(services.shutdown())


def test_token_f1():
    from evaluations.retrieval_eval import token_f1

    assert token_f1("the answer is 42", "42") > 0
    assert token_f1("exact match", "exact match") == 1.0
    assert token_f1("nothing shared", "different words entirely") == 0.0


def test_retrieval_eval_metrics():
    import asyncio

    from evaluations.retrieval_eval import RetrievalCase, evaluate_retrieval

    class C:
        def __init__(self, d):
            self.document_id = d

    async def retrieve(q):
        return [C("doc_b"), C("doc_a"), C("doc_c")]

    async def answer(q):
        return "paris is the capital"

    cases = [
        RetrievalCase("q1", ["doc_a"], "paris"),
        RetrievalCase("q2", ["doc_z"], "london"),
    ]
    out = run_once(
        evaluate_retrieval(cases, retrieve, answer, k=3)
    )
    assert out["recall_at_k"] == 0.5
    assert abs(out["mrr"] - 0.25) < 1e-9  # rank 2 for q1, miss for q2
    assert abs(out["context_precision"] - (1 / 3 + 0) / 2) < 1e-9
    assert out["answer_f1"] > 0


def test_llm_judge_offline_fallback():
    import asyncio

    from evaluations.judge import LLMJudge

    judge = LLMJudge(api_base=None)
    loop = asyncio.new_event_loop()
    assert loop.run_until_complete(judge("q", "42", "the answer is 42")) is True
    assert loop.run_until_complete(judge("q", "42", "no idea")) is False


def test_hotpot_adapter(tmp_path):
    """HotpotQA-format rows -> corpus dir + questions file."""
    import json

    from evaluations.hotpot_adapter import convert

    rows = [
        {
            "question": "Where was the author of Book X born?",
            "answer": "Dublin",
            "supporting_facts": [["Author A", 0]],
            "context": [
                ["Author A", ["Author A was born in Dublin.", "They wrote Book X."]],
                ["Distractor B", ["Unrelated facts about B."]],
            ],
        }
    ]
    src = tmp_path / "hotpot.json"
    src.write_text(json.dumps(rows))
    out = convert(src, tmp_path / "out", limit=10)
    assert out == {"questions": 1, "documents": 2}
    qs = json.loads((tmp_path / "out" / "questions.json").read_text())
    assert qs[0]["gold_docs"] == ["Author_A.txt"]
    assert "Dublin" in (tmp_path / "out" / "corpus" / "Author_A.txt").read_text()


def test_llm_judge_wired_against_endpoint():
    """The offline eval's LLM judge drives a real /chat/completions
    endpoint when configured (round-3: judge wired behind a configured
    completion endpoint; substring stays the fallback)."""
    import asyncio
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from evaluations.judge import LLMJudge

    calls = []

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            body = _json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            calls.append(body)
            verdict = {"correct": "42" in body["messages"][0]["content"]}
            data = _json.dumps(
                {"choices": [{"message": {"content": _json.dumps(verdict)}}]}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        judge = LLMJudge(f"http://127.0.0.1:{srv.server_address[1]}", model="judge-x")
        loop = asyncio.new_event_loop()
        assert loop.run_until_complete(judge("q", "42", "whatever")) is True
        assert calls and calls[0]["model"] == "judge-x"
        loop.close()
    finally:
        srv.shutdown()


def test_build_judge_config():
    import argparse

    from evaluations.run_offline_eval import build_judge

    ns = argparse.Namespace(judge_api_base=None, judge_model=None, judge_api_key=None)
    judge, desc = build_judge(ns)
    assert judge is None and desc.startswith("substring")
    ns2 = argparse.Namespace(
        judge_api_base="http://j:1/v1", judge_model="m", judge_api_key="k")
    judge2, desc2 = build_judge(ns2)
    assert judge2 is not None and desc2 == "llm:m@http://j:1/v1"


def test_fidelity_eval_part_b_small(tmp_path):
    """evaluations/fidelity_eval.py part B (FDE + int8-index recall with
    planted relevant clusters) stays runnable and non-degenerate at tiny
    scale; the int8-vs-f32 index delta must be ~0."""
    import json as _json
    import pathlib
    import subprocess
    import sys

    out_file = tmp_path / "fid.json"
    out = subprocess.run(
        [sys.executable, "evaluations/fidelity_eval.py", "--small", "--cpu",
         "--skip-part-a", "--out", str(out_file)],
        capture_output=True, text=True, timeout=600,
        cwd=str(pathlib.Path(__file__).resolve().parent.parent),
    )
    report = _json.loads(out_file.read_text())
    b = report["part_b_fde_recall_at_scale"]
    assert b["recall_at_75_of_exact_top10"] >= 0.8  # tiny-scale corpus is easy
    assert abs(b["int8_recall_delta_at_75"]) <= 0.05
    assert report["gate"]["thresholds"]["int8_recall_delta_at_75"] == -0.02

@pytest.fixture(scope="module", autouse=True)
def _loop_lifecycle():
    """Run pending callbacks (async-generator aclose tasks scheduled at
    GC) and CLOSE the module loop — an abandoned loop turns those into
    'Task was destroyed but it is pending!' at interpreter exit."""
    yield
    try:
        _LOOP.run_until_complete(asyncio.sleep(0.05))
    finally:
        _LOOP.close()
