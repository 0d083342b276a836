"""CLI coverage for the extended data tools (reference diskann-tools
binaries: compute_multivec/streaming_groundtruth, compute_specificities,
relative_contrast, gen_associated_data_from_range)."""

import json

import numpy as np

from diskann_tpu.tools.__main__ import main as tools_main


def test_streaming_gt_and_associated_data(tmp_path, rng):
    data = rng.standard_normal((200, 8)).astype(np.float32)
    queries = rng.standard_normal((4, 8)).astype(np.float32)
    from diskann_tpu.io_.fbin import write_fbin

    dpath, qpath = str(tmp_path / "d.fbin"), str(tmp_path / "q.fbin")
    write_fbin(dpath, data)
    write_fbin(qpath, queries)

    rb = tmp_path / "rb.yaml"
    rb.write_text(
        "1:\n  operation: insert\n  start: 0\n  end: 150\n"
        "2:\n  operation: search\n"
        "3:\n  operation: delete\n  start: 0\n  end: 50\n"
        "4:\n  operation: search\n"
    )
    out = str(tmp_path / "sgt.json")
    tools_main(["compute-streaming-gt", dpath, qpath, str(rb),
                "-o", out, "-k", "5"])
    got = json.load(open(out))
    assert len(got) == 2
    first = np.array(got[0]["gt"])
    assert first.shape == (4, 5)
    assert (first < 150).all()
    second = np.array(got[1]["gt"])
    assert (second >= 50).all()  # deleted rows can't be groundtruth

    # range gt -> associated data
    rout = str(tmp_path / "range.json")
    tools_main(["compute-range-gt", dpath, qpath, "-o", rout,
                "--radius", "8.0"])
    aout = str(tmp_path / "assoc")
    tools_main(["gen-associated-data", rout, "-o", aout, "-n", "200"])
    vals = np.load(aout + ".npy")
    assert vals.shape == (200,) and (vals >= 0).all()


def test_specificities_and_relative_contrast(tmp_path, rng, capsys):
    labels = tmp_path / "labels.jsonl"
    tools_main(["synthetic-labels", "-o", str(labels), "-n", "100",
                "--n-labels", "5"])
    out = str(tmp_path / "spec.json")
    tools_main(["compute-specificities", str(labels), "-o", out])
    spec = json.load(open(out))
    assert spec and all(0.0 < v <= 3.0 for v in spec.values())

    from diskann_tpu.io_.fbin import write_fbin

    data = rng.standard_normal((300, 8)).astype(np.float32)
    dpath = str(tmp_path / "d.fbin")
    write_fbin(dpath, data)
    tools_main(["relative-contrast", dpath, "--sample", "50"])
    line = [l for l in capsys.readouterr().out.splitlines() if "relative_contrast" in l][-1]
    rc = json.loads(line)["relative_contrast"]
    assert rc > 1.0  # random gaussian data still has contrast > 1


def test_multivec_gt(tmp_path, rng):
    docs = {f"doc_{i}": rng.standard_normal(
        (rng.integers(2, 6), 8)).astype(np.float32) for i in range(20)}
    qs = {f"q_{i}": rng.standard_normal(
        (rng.integers(2, 4), 8)).astype(np.float32) for i in range(3)}
    dz, qz = str(tmp_path / "docs.npz"), str(tmp_path / "qs.npz")
    np.savez(dz, **docs)
    np.savez(qz, **qs)
    out = str(tmp_path / "mvgt.fbin")
    tools_main(["compute-multivec-gt", dz, qz, "-o", out, "-k", "5"])
    from diskann_tpu.io_.fbin import read_fbin

    ids = read_fbin(out)
    assert ids.shape == (3, 5)
