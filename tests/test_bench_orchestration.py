"""bench.py "all"-mode orchestration tests (VERDICT r4 item 1).

BENCH_r03/BENCH_r04 lost the headline number to driver-environment
timeouts. The redesign — one child process, per-config internal watchdog
deadlines, preliminary single-iteration lines, one respawn — is exercised
here end to end via the EDGESTYLE_BENCH_FAKE hook (host-only fake configs;
no device, no jax import in the children). The contract under test: EVERY
config always ends with either a numeric line (final or prelim) or an
explicit error line, and the last line is the headline when it has a
number.
"""

import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench.py")


def _run(fake_spec, budget, timeout=120):
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    env["EDGESTYLE_BENCH_FAKE"] = fake_spec
    env["EDGESTYLE_BENCH_BUDGET"] = str(budget)
    proc = subprocess.run(
        [sys.executable, BENCH], env=env, cwd=os.path.dirname(BENCH),
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        timeout=timeout,
    )
    lines = [json.loads(ln) for ln in proc.stdout.splitlines()
             if ln.startswith("{")]
    return proc.returncode, lines


def _records(lines):
    """Last non-prelim record per metric, with prelim fallback."""
    final, prelim = {}, {}
    for rec in lines:
        (prelim if rec.get("prelim") else final)[rec["metric"]] = rec
    return final, prelim


def test_happy_path_all_lines_numeric():
    rc, lines = _run("tryon:ok,b:ok,c:ok", budget=300)
    assert rc == 0
    final, prelim = _records(lines)
    for m in ("tryon_metric", "b_metric", "c_metric"):
        assert "value" in final[m], final
        assert "value" in prelim[m], prelim  # prelim landed before final
    # headline re-emitted as the very last line (driver `parsed` field)
    assert lines[-1]["metric"] == "tryon_metric"
    assert "value" in lines[-1]


def test_wedge_after_prelim_keeps_number_and_respawns():
    # b wedges after its prelim iteration; its 3 s internal deadline fires,
    # the child exits, and the respawned child still runs c.
    rc, lines = _run("tryon:ok,b:hang:3,c:ok", budget=300)
    assert rc == 0
    final, prelim = _records(lines)
    assert "value" in final["tryon_metric"]
    assert "value" in final["c_metric"]  # ran in the respawned child
    assert "value" in prelim["b_metric"]  # the numeric record that survives
    assert "error" in final["b"]  # explicit internal-deadline line
    assert lines[-1]["metric"] == "tryon_metric" and "value" in lines[-1]


def test_wedge_before_any_measurement_gets_error_line():
    rc, lines = _run("tryon:ok,b:hang0:3,c:ok", budget=300)
    assert rc == 0
    final, _ = _records(lines)
    assert "value" in final["tryon_metric"]
    assert "error" in final["b"] and "deadline" in final["b"]["error"]
    assert "value" in final["c_metric"]


def test_cold_cascade_respawns_until_all_attempted():
    # Two configs wedge back to back (the cold-cache cascade that hit the
    # r5 warm-up run): the orchestrator must keep respawning — a third
    # child — until every config is attempted. The old two-attempt cap
    # abandoned everything after the second wedge with budget to spare.
    rc, lines = _run("tryon:ok,b:hang0:3,c:hang0:3,d:ok", budget=300)
    assert rc == 0
    final, _ = _records(lines)
    assert "value" in final["tryon_metric"]
    assert "error" in final["b"] and "deadline" in final["b"]["error"]
    assert "error" in final["c"] and "deadline" in final["c"]["error"]
    assert "value" in final["d_metric"]  # ran in the THIRD child
    assert lines[-1]["metric"] == "tryon_metric" and "value" in lines[-1]


def test_budget_exhaustion_is_explicit():
    # budget below the parent's 120 s spawn threshold: nothing runs, but
    # every config still gets a line.
    rc, lines = _run("tryon:ok,b:ok", budget=30)
    assert rc == 0
    final, _ = _records(lines)
    assert "not reached" in final["tryon"]["error"]
    assert "not reached" in final["b"]["error"]
