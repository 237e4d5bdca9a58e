"""Pin the bench stdout contract: the driver captures only the last ~2,000
characters of stdout, so the final printed JSON line must stay far below
that — rounds 2 and 3 were unparseable because per-query timing maps
(~4 KB for 148 queries) were embedded in the line."""

import json

import bench


def test_summary_line_fits_driver_tail_capture():
    payload = bench.summary_payload(
        total=12345.678, sf=0.1, n_queries=9999, reps=99,
        artifact_state="pinned-env")
    line = json.dumps(payload, separators=(",", ":"))
    assert len(line) < 1500, len(line)
    # scalars only — a per-query dict here would regrow past the window
    assert all(not isinstance(v, (dict, list)) for v in payload.values())
    assert payload["metric"] == "total_query_wall_seconds"
    assert payload["unit"] == "sec"
    assert payload["per_query_file"] == bench.PER_QUERY_FILE


def test_summary_has_no_queries_key():
    payload = bench.summary_payload(1.0, 0.01, 148, 2, "cold")
    assert "queries" not in payload
