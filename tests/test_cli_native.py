"""CLI surface + native runtime tests."""

import os
import subprocess
import sys

import numpy as np
import pytest

import ngt_tpu
from ngt_tpu import native
from ngt_tpu.cli import (
    main as cli_main, _parse_eval_stream, _epsilon_list, _expansion_list,
)
from ngt_tpu.graph.storage import GraphStore


# ------------------------------------------------------------- native ------


def test_native_available():
    assert native.available(), "g++ toolchain present; native lib must build"


def test_native_tsv_parse(tmp_path):
    p = os.path.join(tmp_path, "d.tsv")
    with open(p, "w") as fh:
        fh.write("1.5\t2\t3\t999\n")  # extra column ignored
        fh.write("4\t5.25\t6\n")
        fh.write("7\t8\n")  # short row zero-padded
    out = native.parse_tsv(p, 3)
    want = np.array([[1.5, 2, 3], [4, 5.25, 6], [7, 8, 0]], np.float32)
    np.testing.assert_array_equal(out, want)


def test_native_merge_matches_numpy(rng):
    """The C++ merge must produce byte-identical results to the numpy path."""
    for trial in range(3):
        g1 = GraphStore(max_edges=8, capacity=64)
        g2 = GraphStore(max_edges=8, capacity=64)
        base_t = rng.integers(0, 50, size=40)
        base_s = rng.integers(0, 50, size=40).astype(np.int32)
        base_d = rng.random(40).astype(np.float32)
        keep = base_t != base_s
        base_t, base_s, base_d = base_t[keep], base_s[keep], base_d[keep]

        # seed both with the SAME rows (unique ids per row)
        ids = np.stack(
            [rng.permutation(50)[:4] for _ in range(10)]
        ).astype(np.int32)
        ds = rng.random((10, 4)).astype(np.float32)
        for g in (g1, g2):
            g.set_nodes(np.arange(10), ids.copy(), ds.copy())

        # numpy path
        import ngt_tpu.native as nat
        orig = nat.merge_edges
        nat.merge_edges = lambda *a, **k: False
        try:
            g1.add_edges(base_t, base_s, base_d)
        finally:
            nat.merge_edges = orig
        # native path
        assert native.available()
        g2.add_edges(base_t, base_s, base_d)

        np.testing.assert_array_equal(g1.nbr_ids, g2.nbr_ids)
        np.testing.assert_allclose(
            np.nan_to_num(g1.nbr_dist, posinf=1e38),
            np.nan_to_num(g2.nbr_dist, posinf=1e38),
        )
        np.testing.assert_array_equal(g1.degree, g2.degree)


# ---------------------------------------------------------------- CLI ------


def test_epsilon_list():
    assert _epsilon_list("0.1") == [0.1]
    assert _epsilon_list("0:0.2:0.1") == [0.0, 0.1, 0.2]
    assert _epsilon_list("0:0.3:0.1:3") == [0.0, 0.1, 0.2, 0.3]


def test_expansion_list():
    # reference -b begin:end[:[x]step] sweep, NGTQCommand.h:321-339
    assert _expansion_list("3.0") == [3.0]
    assert _expansion_list(3.0) == [3.0]
    assert _expansion_list("1:4") == [1.0, 2.0, 3.0, 4.0]
    assert _expansion_list("2:10:4") == [2.0, 6.0, 10.0]
    assert _expansion_list("1:16:x2") == [1.0, 2.0, 4.0, 8.0, 16.0]
    assert _expansion_list("5:1") == [5.0]  # empty range -> begin only
    assert _expansion_list("0:8:x2") == [0.0]  # begin=0 can't multiply up


@pytest.fixture(scope="module")
def cli_index(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    data = np.random.default_rng(5).normal(size=(400, 16)).astype(np.float32)
    dpath = os.path.join(root, "data.tsv")
    np.savetxt(dpath, data, delimiter="\t", fmt="%.6f")
    qpath = os.path.join(root, "query.tsv")
    np.savetxt(qpath, data[:3] + 0.01, delimiter="\t", fmt="%.6f")
    ipath = os.path.join(root, "idx")
    rc = cli_main(["create", "-d", "16", ipath, dpath])
    assert rc == 0
    return ipath, qpath, data


def test_cli_search_plain(cli_index, capsys):
    ipath, qpath, data = cli_index
    rc = cli_main(["search", "-n", "5", "-e", "0.1", ipath, qpath])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Query No.1" in out and "Rank\tID\tDistance" in out
    first = [l for l in out.splitlines() if l.startswith("1\t")][0]
    assert first.split("\t")[1] == "1"  # nearest to query 0 is object 1 (1-based)


def test_cli_search_eval_format_and_eval(cli_index, capsys, tmp_path):
    ipath, qpath, data = cli_index
    # ground truth via linear search, results via graph search
    rc = cli_main(["search", "-n", "5", "-i", "s", "-o", "e", ipath, qpath])
    gt_text = capsys.readouterr().out
    rc2 = cli_main(
        ["search", "-n", "5", "-e", "0:0.2:0.1", "-o", "e", ipath, qpath]
    )
    res_text = capsys.readouterr().out
    assert rc == 0 and rc2 == 0
    assert "# Query No.=1" in gt_text and "# End of Evaluation" in res_text
    parsed = _parse_eval_stream(res_text)
    assert set(parsed.keys()) == {0.0, 0.1, 0.2}
    gt_f = os.path.join(tmp_path, "gt.txt")
    rs_f = os.path.join(tmp_path, "rs.txt")
    open(gt_f, "w").write(gt_text)
    open(rs_f, "w").write(res_text)
    rc3 = cli_main(["eval", "-n", "5", gt_f, rs_f])
    eval_out = capsys.readouterr().out
    assert rc3 == 0
    # precision column for the largest epsilon should be high
    last = [l for l in eval_out.splitlines() if l and not l.startswith("#")][-1]
    assert float(last.split("\t")[1]) >= 0.9


def test_cli_info_and_verify(cli_index, capsys):
    ipath, _, _ = cli_index
    rc = cli_main(["info", ipath])
    out = capsys.readouterr().out
    assert rc == 0 and "# of objects=400" in out
    rc = cli_main(["info", "-m", "v", ipath])
    out = capsys.readouterr().out
    assert rc == 0 and "The index is valid." in out
    rc = cli_main(["info", "-m", "c", ipath])  # checkGraph diagnostic
    out = capsys.readouterr().out
    assert rc == 0 and "checked=400" in out and "mean_overlap=" in out


def test_cli_reconstruct_and_quantize(cli_index, capsys):
    ipath, qpath, data = cli_index
    rc = cli_main(["reconstruct-graph", "-o", "8", "-i", "16", "-m", "s", ipath])
    assert rc == 0
    rc = cli_main(["info", "-m", "v", ipath])
    capsys.readouterr()
    assert rc == 0
    rc = cli_main(["quantize", ipath])
    assert rc == 0
    rc = cli_main(["qsearch", "-n", "3", ipath, qpath])
    out = capsys.readouterr().out
    assert rc == 0 and "Query No.1" in out
    # result-expansion sweep prints one block per swept value
    rc = cli_main(["qsearch", "-n", "3", "-p", "1:4:x2", ipath, qpath])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("# Result expansion=") == 3 * 3  # 3 queries x 3 values


def test_cli_ngtqg_aliases_and_reconstruct_anng(tmp_path, capsys):
    """The ngtqg-* named command surface (NGTQGCommand.cpp:25-293) and the
    reconstruct-anng thinning pass (GraphReconstructor.h:717-801)."""
    data = np.random.default_rng(9).normal(size=(300, 12)).astype(np.float32)
    dpath = os.path.join(tmp_path, "d.tsv")
    np.savetxt(dpath, data, delimiter="\t", fmt="%.6f")
    qpath = os.path.join(tmp_path, "q.tsv")
    np.savetxt(qpath, data[:2] + 0.01, delimiter="\t", fmt="%.6f")
    ipath = os.path.join(tmp_path, "qgidx")
    assert cli_main(["ngtqg-create", "-d", "12", "-E", "16", ipath]) == 0
    assert cli_main(["ngtqg-build", ipath, dpath]) == 0
    assert cli_main(["ngtqg-quantize", ipath]) == 0
    assert cli_main(["ngtqg-search", "-n", "3", ipath, qpath]) == 0
    out = capsys.readouterr().out
    assert "Query No.1" in out
    # thin the ANNG and verify searches still work
    assert cli_main(["reconstruct-anng", "-e", "4", ipath]) == 0
    reopened = ngt_tpu.open_index(ipath)
    assert reopened.graph.degree[1:301].max() > 0
    ids, _ = reopened.batch_search(data[:4], size=3, epsilon=0.2)
    assert (np.asarray(ids)[:, 0] == np.arange(4)).all()


def test_cli_remove_and_repair(cli_index, capsys):
    ipath, _, data = cli_index
    rc = cli_main(["remove", ipath, "5"])
    assert rc == 0
    # the CLI speaks 1-based ids (what `search` prints): "5" must delete
    # the object search would have printed as ID 5 — zero-based id 4 —
    # and leave its neighbors alone
    reopened = ngt_tpu.open_index(ipath)
    with pytest.raises(KeyError):
        reopened.get_object(4)
    np.testing.assert_allclose(reopened.get_object(5), data[5], atol=1e-5)
    np.testing.assert_allclose(reopened.get_object(3), data[3], atol=1e-5)
    rc = cli_main(["repair", ipath])
    assert rc == 0
    rc = cli_main(["info", "-m", "v", ipath])
    out = capsys.readouterr().out
    assert "The index is valid." in out


def test_cli_module_entrypoint(tmp_path):
    """python -m ngt_tpu --help works (module entry like the ngt binary)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "ngt_tpu", "--help"],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=120,
    )
    assert r.returncode == 0
    assert "create" in r.stdout and "reconstruct-graph" in r.stdout


def test_cli_export_graph(cli_index, capsys):
    ipath, _, _ = cli_index
    rc = cli_main(["export-graph", ipath])
    out = capsys.readouterr().out
    assert rc == 0
    first = out.splitlines()[0].split("\t")
    assert first[0] == "1" and ":" in first[1]


def test_utils_probes_and_timer():
    from ngt_tpu import utils

    assert utils.get_process_vm_rss() > 0
    assert utils.get_process_vm_peak() >= utils.get_process_vm_rss() // 2
    t = utils.Timer().start()
    t.stop()
    assert t.time >= 0
    utils.disable_log()
    utils.enable_log()


def test_cli_ngtq_family(cli_index, capsys, tmp_path):
    """The ngtq command set (reference NGTQ/NGTQCommand.h:574-613):
    create/append/search/info/validate/rebuild."""
    _, qpath, data = cli_index
    root = str(tmp_path)
    dpath = os.path.join(root, "qdata.tsv")
    np.savetxt(dpath, data, delimiter="\t", fmt="%.6f")
    ipath = os.path.join(root, "nq")
    rc = cli_main(["ngtq-create", "-d", "16", "-C", "32", ipath, dpath])
    assert rc == 0
    capsys.readouterr()
    rc = cli_main(["ngtq-search", "-n", "5", "-p", "8", ipath, qpath])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Query No.1" in out
    first = [l for l in out.splitlines() if l.startswith("1\t")][0]
    assert first.split("\t")[1] == "1"
    # append grows the index without retraining
    rc = cli_main(["ngtq-append", ipath, dpath])
    assert rc == 0
    capsys.readouterr()
    rc = cli_main(["ngtq-info", ipath])
    out = capsys.readouterr().out
    assert rc == 0
    assert "objects\t800" in out
    rc = cli_main(["ngtq-validate", "-s", "128", ipath])
    out = capsys.readouterr().out
    assert rc == 0 and "valid" in out
    rc = cli_main(["ngtq-rebuild", ipath])
    assert rc == 0
    capsys.readouterr()
    rc = cli_main(["ngtq-search", "-n", "3", "-m", "e", ipath, qpath])
    out = capsys.readouterr().out
    assert rc == 0 and "Query No.1" in out
    # remove tombstones an object; compress reclaims it (reference ngtq
    # remove/compress, NGTQCommand.h:430-496, Quantizer.h:2747)
    rc = cli_main(["ngtq-remove", ipath, "1"])
    assert rc == 0
    capsys.readouterr()
    rc = cli_main(["ngtq-search", "-n", "5", "-p", "32", ipath, qpath])
    out = capsys.readouterr().out
    assert rc == 0
    first = [l for l in out.splitlines() if l.startswith("1\t")][0]
    assert first.split("\t")[1] != "1"
    rc = cli_main(["ngtq-compress", ipath])
    assert rc == 0
    capsys.readouterr()
    rc = cli_main(["ngtq-info", ipath])
    out = capsys.readouterr().out
    assert rc == 0 and "objects\t799" in out
    # mmap raw store: the raw file is created inside the index dir at
    # insert time (spill path), before build
    mpath = os.path.join(root, "nq_mmap")
    rc = cli_main(["ngtq-create", "-d", "16", "-C", "32",
                   "--raw-store", "mmap", mpath, dpath])
    assert rc == 0
    assert os.path.getsize(os.path.join(mpath, "raw.f32")) == data.nbytes
    capsys.readouterr()
    rc = cli_main(["ngtq-search", "-n", "5", "-p", "8", mpath, qpath])
    out = capsys.readouterr().out
    assert rc == 0 and "Query No.1" in out
