"""bench.py aggregate-line mechanics (VERDICT r4 task 1c): after every
config the cumulative aggregate prints, headline-first, so the LAST JSON
line on stdout never falls on the worst config when an external timeout
kills the run mid-capture."""
import json

import bench


def _fake(metric, value, vs, spec):
    return {
        "metric": metric, "value": value, "unit": "frames/sec", "vs_baseline": vs,
        "detail": {"spec": spec, "wall_s": 1.0, "mfu_denoise": 0.5,
                   "writer_backend": "mjpeg+coef-lerp", "weights": "random-init"},
    }


def test_emit_prints_headline_first_aggregate(tmp_path, monkeypatch, capsys):
    fp = tmp_path / "results.jsonl"
    monkeypatch.setenv("LB_BENCH_RESULTS_FILE", str(fp))

    bench._emit("turbo", _fake("SDXL-Turbo 512x512 ...", 200.0, 6.7, "sdxl-turbo"))
    bench._emit("base", _fake("SDXL-base 1024x1024 ...", 12.0, 0.4, "sdxl-base"))

    lines = [json.loads(s) for s in capsys.readouterr().out.strip().splitlines()]
    # per-config line then aggregate, per emit: 4 lines total
    assert len(lines) == 4
    last = lines[-1]
    assert last["detail"]["aggregate"] is True
    # headline (turbo) metrics at top level even though base printed last
    assert last["value"] == 200.0 and last["vs_baseline"] == 6.7
    assert set(last["detail"]["configs"]) == {"turbo", "base"}
    assert last["detail"]["configs"]["base"]["vs_baseline"] == 0.4
    assert last["detail"]["configs"]["turbo"]["writer_backend"] == "mjpeg+coef-lerp"


def test_emit_retry_overwrites_not_duplicates(tmp_path, monkeypatch, capsys):
    fp = tmp_path / "results.jsonl"
    monkeypatch.setenv("LB_BENCH_RESULTS_FILE", str(fp))
    bench._emit("turbo", _fake("t", 100.0, 5.0, "sdxl-turbo"))
    bench._emit("turbo", _fake("t", 111.0, 5.5, "sdxl-turbo"))  # retried config
    last = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert last["detail"]["n_configs"] == 1
    assert last["value"] == 111.0


def test_emit_without_results_file_prints_config_line_only(monkeypatch, capsys):
    monkeypatch.delenv("LB_BENCH_RESULTS_FILE", raising=False)
    bench._emit("turbo", _fake("t", 100.0, 5.0, "sdxl-turbo"))
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 1


def test_watchdog_soft_wedge_detection():
    """Milestone watchdog: a soft wedge (CPU trickle, no milestones) is
    killed; legit long compiles (high CPU duty) and healthy milestone
    cadence are not. Regression for the 2026-08-20 degraded-relay day —
    two 15-min wedges at 9% CPU defeated the pure-CPU stall test."""
    import bench

    def fresh(t0=1000.0, cpu0=100.0):
        return ({"cpu": cpu0, "t": t0}, {"beat_t": t0, "beat_cpu": cpu0})

    # 1. soft wedge: 9% CPU trickle, no milestone for > 420 s -> kill
    state, wd = fresh()
    # trickle feeds the pure-CPU detector every tick (2.7 s per 30 s tick)
    verdict = None
    for i in range(1, 20):
        now = 1000.0 + 30 * i
        cpu = 100.0 + 2.7 * i
        verdict = bench._watchdog_check(now, cpu, state, wd, 900.0, 420.0)
        if verdict:
            break
    assert verdict and "no milestone" in verdict
    assert now - 1000.0 <= 450.0  # caught within one tick of the window

    # 2. legit compile: 100% CPU duty, no milestone -> window restarts, no kill
    state, wd = fresh()
    for i in range(1, 40):
        now = 1000.0 + 30 * i
        cpu = 100.0 + 30.0 * i
        assert bench._watchdog_check(now, cpu, state, wd, 900.0, 420.0) is None

    # 3. healthy cadence: heartbeat every 120 s resets the window -> no kill
    state, wd = fresh()
    for i in range(1, 40):
        now = 1000.0 + 30 * i
        cpu = 100.0 + 2.7 * i
        if i % 4 == 0:
            wd["beat_t"], wd["beat_cpu"] = now, cpu
        assert bench._watchdog_check(now, cpu, state, wd, 900.0, 420.0) is None

    # 4. hard wedge: ZERO CPU for > 900 s still trips the original detector
    state, wd = fresh()
    wd["beat_t"] = float("inf")  # isolate the CPU detector
    verdict = None
    for i in range(1, 40):
        now = 1000.0 + 30 * i
        verdict = bench._watchdog_check(now, 100.0, state, wd, 900.0, 0.0)
        if verdict:
            break
    assert verdict and "no CPU progress" in verdict
