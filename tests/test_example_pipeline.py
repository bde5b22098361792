"""Smoke test for the end-to-end library composition demo."""


def test_pipeline_demo_runs_end_to_end():
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    from examples.pipeline_demo import main

    report = main("/root/testdata/sf0.001")
    assert report["n_raw"] >= report["n_kept"] >= report["n_after_dedup"] > 0
    assert report["n_hits"] > 0
    assert 0.0 <= report["avg_recall"] <= 1.0
    assert report["p50_latency_ms"] > 0.0
