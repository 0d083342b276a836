"""Golden-file UX test for benchmark output formatting.

Mirrors the reference's checked-in `expected.txt` pattern
(`diskann-benchmark-core/src/lib.rs:55-80`): deterministic parts of the
benchmark result are rendered to text and compared to a golden file;
regenerate with DISKANN_TEST=overwrite."""

import json
import os

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "registry_output.txt")


def render(results):
    """Stable text rendering: timings and throughputs stripped."""
    lines = []
    for r in results:
        lines.append(f"benchmark: {r['benchmark']}")
        for key in sorted(r["job"]):
            lines.append(f"  job.{key} = {r['job'][key]}")
        stable = {
            k: v for k, v in r["result"].items()
            if not isinstance(v, float)
        }
        lines.append(f"  result keys: {sorted(r['result'])}")
        lines.append(f"  stable: {json.dumps(stable, sort_keys=True)}")
    return "\n".join(lines) + "\n"


def test_registry_output_golden():
    from diskann_tpu.bench.registry import Registry

    reg = Registry()
    reg.register("toy", lambda job: {"qps": 123.4, "recall": 0.99,
                                     "config": {"l": job["l"]}})
    results = reg.run_jobs([
        {"benchmark": "toy", "l": 10},
        {"benchmark": "toy", "l": 20},
    ])
    text = render(results)
    if os.environ.get("DISKANN_TEST") == "overwrite":
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            f.write(text)
    with open(GOLDEN) as f:
        assert f.read() == text
