"""Deficit-aware bench section rotation (VERDICT r3 #1).

The driver captures only what fits its wall budget; ``bench.py`` must scan
prior ``BENCH_r*.json`` records and run never-captured sections first.
These tests exercise the record-scanning logic on synthetic driver records
(including the real r3 shape: values both in ``parsed.extra`` and in raw
``tail`` JSON lines, skipped sections recorded as strings).
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import SECTION_EVIDENCE, driver_captured_sections  # noqa: E402


def _write(dirpath, name, rec):
    (dirpath / name).write_text(json.dumps(rec))


def test_scan_empty_dir(tmp_path):
    assert driver_captured_sections(str(tmp_path)) == set()


def test_scan_parsed_extra(tmp_path):
    _write(tmp_path, "BENCH_r01.json", {
        "rc": 0,
        "parsed": {"value": 5.4, "extra": {
            "blip2_decode_tokens_per_sec": 987.9,
            "fps_pallas_speedup": 1.29,
            # skipped sections are STRINGS and must not count as captured
            "train": "skipped_budget",
            "serving": "skipped_budget",
        }},
    })
    got = driver_captured_sections(str(tmp_path))
    assert got == {"blip2_decode", "fps"}


def test_scan_tail_lines_and_union_across_rounds(tmp_path):
    # r1: tail-only record (parse failed driver-side), serving captured
    _write(tmp_path, "BENCH_r01.json", {
        "rc": 124, "parsed": None,
        "tail": "garbage line\n" + json.dumps({
            "value": 5.0,
            "extra": {"serving_6q_per_scene_samples_per_sec": 58.7}}) + "\n",
    })
    # r2: parsed record, gather rates + b2
    _write(tmp_path, "BENCH_r02.json", {
        "rc": 0,
        "parsed": {"extra": {"measured_gather_gbps": 10.2,
                             "headline_b2_samples_per_sec": 10.7}},
    })
    got = driver_captured_sections(str(tmp_path))
    assert got == {"serving", "gather_rates", "b2"}


def test_scan_reduced_depth_train_counts(tmp_path):
    _write(tmp_path, "BENCH_r04.json", {
        "rc": 0,
        "parsed": {"extra": {
            "train_samples_per_sec_reduced_depth_layers1111": 9.1}},
    })
    assert driver_captured_sections(str(tmp_path)) == {"train"}


def test_scan_ignores_unreadable_records(tmp_path):
    (tmp_path / "BENCH_r01.json").write_text("{not json")
    _write(tmp_path, "BENCH_r02.json", {
        "parsed": {"extra": {"hostplan_samples_per_sec": 15.2}}})
    assert driver_captured_sections(str(tmp_path)) == {"hostplan"}


def test_real_repo_records_parse():
    """The actual BENCH_r*.json records next to bench.py must yield at
    least the r3 driver-captured set; never-captured-by-r3 sections must
    stay uncaptured until a real driver record carries them."""
    got = driver_captured_sections()
    assert {"gather_rates", "blip2_decode", "fps"} <= got
    # keep this in sync if a later driver record captures them for real
    recorded_labels = {"blip2_train", "train", "serving", "b2", "hostplan"}
    for name in recorded_labels & got:
        # if this fires, a new BENCH_r*.json landed — update the test
        import glob
        import os
        root = Path(__file__).resolve().parent.parent
        assert len(glob.glob(os.path.join(root, "BENCH_r0[4-9].json"))), \
            f"{name} captured but only r1-r3 records exist"


def test_evidence_keys_cover_all_sections():
    assert set(SECTION_EVIDENCE) == {
        "gather_rates", "blip2_decode", "blip2_train", "train",
        "serving", "b2", "hostplan", "fps"}
