"""Unit tests for the probe-gated scaling-pair summary in bench.py.

The r3 verdict asked for median-of-paired-ratios with probe-certified quiet
pairs (VERDICT.md "Next round #1"). The pair-admission loop needs a real
45-minute run; the classification + summary logic is pure and tested here.
"""
import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import _median, _pair_is_clean, _pair_is_stable, _summarize_pairs

THRESH = 0.2875


def _pair(i, eff, p_lo=0.25, p_hi=0.25, p_end=0.25, thr_lo=3000.0, thr_hi=None):
    rec = {
        "pair": i,
        "probe_lo": p_lo,
        "probe_hi": p_hi,
        "probe_end": p_end,
        "thr_lo": thr_lo,
        "thr_hi": thr_hi if thr_hi is not None else thr_lo * 4 * eff,
        "efficiency": eff,
        "postings_efficiency": eff,
        "stages_lo": {},
        "stages_hi": {},
    }
    rec["clean"] = _pair_is_clean(rec, THRESH)
    return rec


def test_pair_is_clean_requires_all_three_probes_quiet():
    assert _pair_is_clean(
        {"probe_lo": 0.25, "probe_hi": 0.28, "probe_end": 0.2875}, THRESH
    )
    for dirty_key in ("probe_lo", "probe_hi", "probe_end"):
        rec = {"probe_lo": 0.25, "probe_hi": 0.25, "probe_end": 0.25}
        rec[dirty_key] = 0.40
        assert not _pair_is_clean(rec, THRESH), dirty_key


def test_summary_all_clean_is_quiet_and_median_graded():
    pairs = [_pair(0, 0.95), _pair(1, 0.83), _pair(2, 0.88)]
    out = _summarize_pairs(pairs, [], (2, 8), THRESH)
    assert out["quiet"] is True
    assert out["efficiency_N_to_4N"] == 0.88  # median, not max/min
    assert out["efficiency_pairs"] == [0.95, 0.83, 0.88]
    assert "efficiency_clean_median" not in out  # no mixed set, no extra row
    assert "rejected_pairs" not in out
    assert len(out["probes_s_per_proc"]) == 9  # 3 probes per pair


def test_summary_mixed_set_is_not_quiet_and_records_clean_median():
    pairs = [_pair(0, 0.95), _pair(1, 0.70, p_hi=0.55), _pair(2, 0.90)]
    out = _summarize_pairs(pairs, [], (2, 8), THRESH)
    assert out["quiet"] is False
    assert out["efficiency_N_to_4N"] == 0.90  # median over all accepted
    assert out["efficiency_clean_median"] == 0.925  # avg-middle-pair of 2

def test_summary_rejected_pairs_kept_as_receipts_not_graded():
    accepted = [_pair(0, 0.85), _pair(1, 0.87), _pair(2, 0.84)]
    rejected = [_pair(9, 1.40, p_end=0.60)]  # noise-broken ratio, discarded
    out = _summarize_pairs(accepted, rejected, (2, 8), THRESH)
    assert out["quiet"] is True
    assert out["efficiency_N_to_4N"] == 0.85
    assert out["rejected_pairs"] == rejected  # full receipts preserved
    assert 1.40 not in out["efficiency_pairs"]


def test_summary_throughput_medians_per_width():
    pairs = [
        _pair(0, 0.9, thr_lo=3000.0),
        _pair(1, 0.9, thr_lo=3200.0),
        _pair(2, 0.9, thr_lo=3100.0),
    ]
    out = _summarize_pairs(pairs, [], (2, 8), THRESH)
    assert out["thr_2"] == 3100.0
    assert out["thr_2_all"] == [3000.0, 3200.0, 3100.0]
    assert out["thr_8"] == _median([p["thr_hi"] for p in pairs])


def test_median_even_count_averages_middle_pair():
    assert _median([0.8, 1.0]) == 0.9
    assert _median([0.7]) == 0.7


def test_pair_stability_is_relative_spread_not_absolute():
    # steadily-throttled window: probes all ~0.40 — not quiet, but STABLE
    # (constant throttle divides out of the paired ratio)
    rec = {"probe_lo": 0.40, "probe_hi": 0.42, "probe_end": 0.41}
    assert not _pair_is_clean(rec, THRESH)
    assert _pair_is_stable(rec)
    # load ramping mid-pair: spread 0.40 -> 0.60 breaks the ratio's validity
    assert not _pair_is_stable({"probe_lo": 0.40, "probe_hi": 0.50, "probe_end": 0.60})
    # degenerate inputs never certify
    assert not _pair_is_stable({"probe_lo": 0.40})
    assert not _pair_is_stable({"probe_lo": 0.0, "probe_hi": 0.0, "probe_end": 0.0})


def test_summary_stable_flag_certifies_every_accepted_pair():
    quiet_and_stable = [_pair(0, 0.9), _pair(1, 0.85), _pair(2, 0.88)]
    out = _summarize_pairs(quiet_and_stable, [], (2, 8), THRESH)
    assert out["stable"] is True and out["quiet"] is True

    throttled_but_stable = [
        _pair(0, 0.9, p_lo=0.40, p_hi=0.41, p_end=0.42),
        _pair(1, 0.85, p_lo=0.39, p_hi=0.40, p_end=0.41),
    ]
    out = _summarize_pairs(throttled_but_stable, [], (2, 8), THRESH)
    assert out["quiet"] is False  # absolute gate stays honest
    assert out["stable"] is True  # ratio-validity still certified

    ramping = [_pair(0, 0.9, p_lo=0.30, p_hi=0.45, p_end=0.60)]
    out = _summarize_pairs(ramping, [], (2, 8), THRESH)
    assert out["quiet"] is False and out["stable"] is False


def test_pool_attempts_medians_admitted_pairs_across_files(tmp_path):
    import json

    from bench import _pool_attempts

    bdir = tmp_path / ".benchmarks"
    bdir.mkdir()
    import bench

    runs = [
        {"efficiency_pairs": [0.9, 1.1, 0.8],
         "rejected_pairs": [{"efficiency": 0.2}]},  # rejected stays out
        {"efficiency_pairs": [1.0, 0.7]},
    ]
    for i, s in enumerate(runs, 1):
        (bdir / f"scaling_{bench.ROUND}_attempt{i}.json").write_text(
            json.dumps({"scaling": s})
        )
    # a PRIOR round's attempt must NOT pool into this round (ADVICE r4)
    (bdir / "scaling_r0_attempt1.json").write_text(
        json.dumps({"scaling": {"efficiency_pairs": [0.01]}})
    )
    out = _pool_attempts(str(tmp_path))
    assert out["pooled_pairs"] == [0.9, 1.1, 0.8, 1.0, 0.7]
    assert out["pooled_efficiency_median"] == 0.9
    assert out["pooled_n_attempts"] == 2
    assert _pool_attempts(str(tmp_path / "empty")) is None


def test_save_attempt_picks_next_free_slot(tmp_path):
    import json

    from bench import _save_attempt

    import bench

    p1 = _save_attempt(str(tmp_path), {"efficiency_pairs": [1.0]})
    p2 = _save_attempt(str(tmp_path), {"efficiency_pairs": [0.9]})
    assert p1.endswith(f"scaling_{bench.ROUND}_attempt1.json")
    assert p2.endswith(f"scaling_{bench.ROUND}_attempt2.json")
    assert json.load(open(p2))["scaling"]["efficiency_pairs"] == [0.9]


# ---- best-probe bench-run selection (r4 verdict #5/#6) ---------------------
from bench import _best_bench_run, _probe_score  # noqa: E402


def _run(pre, post, value):
    return {
        "value": value,
        "host_probe": {"pre": {"1": pre}, "post": {"1": post}},
    }


def test_probe_score_is_mean_of_bracketing_probes():
    assert _probe_score(_run(0.2, 0.4, 100)) == pytest.approx(0.3)
    assert _probe_score({"host_probe": {}}) == float("inf")


def test_best_run_is_quietest_not_latest():
    runs = [_run(0.25, 0.26, 150.0), _run(0.45, 0.50, 210.0), _run(0.39, 0.40, 205.0)]
    assert _best_bench_run(runs) == 0


def test_best_run_tie_prefers_latest():
    runs = [_run(0.30, 0.30, 150.0), _run(0.30, 0.30, 149.0)]
    assert _best_bench_run(runs) == 1


def test_pool_attempts_is_protocol_aware(tmp_path):
    """Confined (taskset) and unconfined attempts measure physically
    different quantities — an unconfined local[2] JVM uses ~8 cores on this
    box — so a protocol-tagged pool must exclude off-protocol attempts
    (they stay on disk as receipts)."""
    import json

    import bench
    from bench import _pool_attempts

    bdir = tmp_path / ".benchmarks"
    bdir.mkdir()
    runs = [
        # legacy attempt: no protocol field == "median-of-paired-ratios"
        {"efficiency_pairs": [0.5, 0.6]},
        {"protocol": "median-of-paired-ratios+cpuset",
         "efficiency_pairs": [0.9, 1.0]},
        {"protocol": "median-of-paired-ratios+cpuset",
         "efficiency_pairs": [0.95]},
    ]
    for i, s in enumerate(runs, 1):
        (bdir / f"scaling_{bench.ROUND}_attempt{i}.json").write_text(
            json.dumps({"scaling": s})
        )
    out = _pool_attempts(str(tmp_path), "median-of-paired-ratios+cpuset")
    assert out["pooled_pairs"] == [0.9, 1.0, 0.95]
    assert out["pooled_efficiency_median"] == 0.95
    assert out["pooled_n_attempts"] == 2
    assert out["pooled_protocol"] == "median-of-paired-ratios+cpuset"

    # untagged pooling (protocol=None) keeps the legacy pool-everything shape
    out_all = _pool_attempts(str(tmp_path))
    assert out_all["pooled_pairs"] == [0.5, 0.6, 0.9, 1.0, 0.95]
    assert "pooled_protocol" not in out_all

    # the legacy protocol pools only the untagged attempt
    out_legacy = _pool_attempts(str(tmp_path), "median-of-paired-ratios")
    assert out_legacy["pooled_pairs"] == [0.5, 0.6]
    assert out_legacy["pooled_n_attempts"] == 1


def test_summarize_pairs_carries_protocol_tag():
    pairs = [_pair(0, 0.9), _pair(1, 0.85), _pair(2, 0.88)]
    out = _summarize_pairs(
        pairs, [], (2, 8), THRESH, protocol="median-of-paired-ratios+cpuset"
    )
    assert out["protocol"] == "median-of-paired-ratios+cpuset"
    # default stays the legacy string so old receipts remain interpretable
    out = _summarize_pairs(pairs, [], (2, 8), THRESH)
    assert out["protocol"] == "median-of-paired-ratios"


def test_pool_attempts_is_fingerprint_aware(tmp_path):
    """Attempts pool only within identical measured build code: a shakedown
    run recorded before a perf-relevant indexer edit measured DIFFERENT code
    and must stay out of the edited code's graded median (it remains on disk
    as a receipt)."""
    import json

    import bench
    from bench import _pool_attempts

    bdir = tmp_path / ".benchmarks"
    bdir.mkdir()
    proto = "median-of-paired-ratios+standalone"
    runs = [
        # pre-edit shakedown: same protocol, older code
        {"protocol": proto, "scaling_fingerprint": "aaaa00000000",
         "efficiency_pairs": [0.54, 0.49]},
        {"protocol": proto, "scaling_fingerprint": "bbbb11111111",
         "efficiency_pairs": [0.85, 0.9]},
        # legacy attempt: no fingerprint field at all
        {"protocol": proto, "efficiency_pairs": [0.3]},
    ]
    for i, s in enumerate(runs, 1):
        (bdir / f"scaling_{bench.ROUND}_attempt{i}.json").write_text(
            json.dumps({"scaling": s})
        )
    out = _pool_attempts(str(tmp_path), proto, "bbbb11111111")
    assert out["pooled_pairs"] == [0.85, 0.9]
    assert out["pooled_n_attempts"] == 1
    assert out["pooled_fingerprint"] == "bbbb11111111"

    # without a fingerprint the pool keeps the protocol-wide shape
    out_all = _pool_attempts(str(tmp_path), proto)
    assert out_all["pooled_pairs"] == [0.54, 0.49, 0.85, 0.9, 0.3]
    assert "pooled_fingerprint" not in out_all


def test_pool_attempts_is_cores_aware(tmp_path):
    """Attempts pool only within one (N, 4N) core pairing: a (2,8) pair
    shares different per-core DRAM bandwidth than a (1,4) pair on a
    single-socket box, so their paired ratios measure different physical
    quantities and must not mix into one median."""
    import json

    import bench
    from bench import _pool_attempts

    bdir = tmp_path / ".benchmarks"
    bdir.mkdir()
    proto = "median-of-paired-ratios+standalone"
    fp = "cccc22222222"
    runs = [
        {"protocol": proto, "scaling_fingerprint": fp, "cores": [2, 8],
         "efficiency_pairs": [0.64, 0.69]},
        {"protocol": proto, "scaling_fingerprint": fp, "cores": [1, 4],
         "efficiency_pairs": [0.82, 0.86]},
    ]
    for i, s in enumerate(runs, 1):
        (bdir / f"scaling_{bench.ROUND}_attempt{i}.json").write_text(
            json.dumps({"scaling": s})
        )
    out = _pool_attempts(str(tmp_path), proto, fp, [1, 4])
    assert out["pooled_pairs"] == [0.82, 0.86]
    assert out["pooled_n_attempts"] == 1

    # without a cores filter the pool keeps the fingerprint-wide shape
    out_all = _pool_attempts(str(tmp_path), proto, fp)
    assert out_all["pooled_pairs"] == [0.64, 0.69, 0.82, 0.86]


def test_scaling_fingerprint_tracks_build_path_edits(tmp_path):
    """The fingerprint is a pure content hash of the build-path files."""
    import shutil

    import bench

    repo = tmp_path / "repo"
    for rel in (
        "intuition_spark/index/builder.py",
        "intuition_spark/index/codec.py",
        "intuition_spark/analysis/analyzers.py",
        "intuition_spark/analysis/porter.py",
        "intuition_spark/session.py",
        "scripts/build_index_job.py",
    ):
        src = pathlib.Path(bench.__file__).parent / rel
        dst = repo / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(src, dst)
    fp1 = bench._scaling_fingerprint(str(repo))
    assert fp1 == bench._scaling_fingerprint(str(bench.__file__).rsplit("/", 1)[0])
    (repo / "intuition_spark/index/builder.py").write_text("# edited\n")
    assert bench._scaling_fingerprint(str(repo)) != fp1
