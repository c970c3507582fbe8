"""Eval-harness smoke test on a small synthetic corpus."""

import asyncio
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
