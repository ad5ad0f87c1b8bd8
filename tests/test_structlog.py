"""Structured JSON-lines logging (utils/structlog.py): one env flag yields
a machine-readable per-stage trace of a prove — the native analog of the
reference's env_logger wiring (zkit/src/main.rs:266, per-stage log::info!
throughout starky/recursion/zkvm)."""
import json

from eigen_zkvm_tpu.utils import structlog


def test_prove_emits_machine_readable_trace(tmp_path, monkeypatch):
    log = tmp_path / "trace.jsonl"
    monkeypatch.setattr(structlog, "_dest", str(log))

    from eigen_zkvm_tpu.stark.polsarray import PolsArray
    from eigen_zkvm_tpu.stark.stark_gen import stark_gen
    from eigen_zkvm_tpu.stark.stark_setup import StarkSetup
    from eigen_zkvm_tpu.stark.types import load_pil, load_starkstruct

    FIX = "/root/reference/starky/data/"
    pil = load_pil(FIX + "fib.pil.json.gl")
    ss = load_starkstruct(FIX + "starkStruct.json.gl")
    const_pols = PolsArray(pil, PolsArray.CONSTANT).load(FIX + "fib.const.gl")
    cm_pols = PolsArray(pil, PolsArray.COMMIT).load(FIX + "fib.cm.gl")
    setup = StarkSetup(const_pols, pil, ss)
    stark_gen(cm_pols, const_pols, setup.const_tree, setup.starkinfo,
              setup.program, ss)

    recs = [json.loads(l) for l in log.read_text().splitlines()]
    assert recs, "no structured records emitted"
    events = [r["event"] for r in recs]
    assert "stark_gen.start" in events
    stage_recs = [r for r in recs if r["event"] == "stark_gen.stage"]
    stages = [r["stage"] for r in stage_recs]
    assert any("stage1" in s for s in stages)
    assert any("fri" in s for s in stages)
    for r in recs:  # every record is schema-complete and timestamped
        assert {"ts", "elapsed", "event"} <= set(r)
    for r in stage_recs:
        assert isinstance(r["wall"], float)


def test_span_records_errors(tmp_path, monkeypatch):
    log = tmp_path / "err.jsonl"
    monkeypatch.setattr(structlog, "_dest", str(log))
    try:
        with structlog.span("unit.boom", k=1):
            raise ValueError("nope")
    except ValueError:
        pass
    (rec,) = [json.loads(l) for l in log.read_text().splitlines()]
    assert rec["event"] == "unit.boom" and rec["k"] == 1
    assert rec["error"].startswith("ValueError")
