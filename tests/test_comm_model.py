"""Analytic collective-traffic model (parallel/comm_model.py): exactness
of the byte accounting against the shard_map code's shapes, and sanity of
the efficiency projection."""

from regex_fpga_tpu.parallel.comm_model import (
    comm_model_report,
    fast_dist_comm_bytes,
    min_shard_bytes_for_efficiency,
    project_efficiency,
)


def test_byte_accounting_matches_shapes():
    # batch=8 over n_data=2 -> b_loc=4; n_seq=4; overlap=64; iters=2
    c = fast_dist_comm_bytes(8, 1 << 20, 2, 4, overlap=64, iters=2)
    b = c["per_device_bytes"]
    assert b["seam_tail_ppermute"] == 4 * 64 * 4     # b_loc*ov*4
    assert b["finals_ppermute_x_iters"] == 2 * 4 * 4  # iters*b_loc*4
    assert b["counts_psum"] == 2 * (3 / 4) * 4 * 4    # ring allreduce
    assert b["finals_all_gather"] == 3 * 4 * 4        # (n_seq-1)*b_loc*4
    assert c["collective_phases"] == 1 + 2 * 2 + 2
    assert b["total"] == sum(
        v for k, v in b.items() if k != "total"
    )


def test_traffic_is_shard_length_independent():
    c1 = fast_dist_comm_bytes(8, 1 << 20, 2, 4)
    c2 = fast_dist_comm_bytes(8, 1 << 28, 2, 4)
    assert (c1["per_device_bytes"]["total"]
            == c2["per_device_bytes"]["total"])
    # so bytes-per-scanned-byte falls linearly with shard size
    assert c2["bytes_per_scanned_byte"] < c1["bytes_per_scanned_byte"] / 100


def test_efficiency_projection_monotone():
    c_small = fast_dist_comm_bytes(8, 1 << 18, 2, 4)
    c_big = fast_dist_comm_bytes(8, 1 << 26, 2, 4)
    e_small = project_efficiency(c_small, 2.36e9)["efficiency"]
    e_big = project_efficiency(c_big, 2.36e9)["efficiency"]
    assert e_small < e_big < 1.0
    # benched 64 MiB shards: >= 99% on the slow-day rate
    assert e_big > 0.99


def test_min_shard_inverts_projection():
    for target in (0.85, 0.99):
        m = min_shard_bytes_for_efficiency(target, 8, 2, 4, 6.16e9)
        c = fast_dist_comm_bytes(8, m, 2, 4)
        assert project_efficiency(c, 6.16e9)["efficiency"] >= target
        c_under = fast_dist_comm_bytes(8, int(m * 0.9), 2, 4)
        assert project_efficiency(c_under, 6.16e9)["efficiency"] < target


def test_report_shape():
    r = comm_model_report()
    assert len(r["configs"]) == 5
    for row in r["configs"]:
        assert 0 < row["efficiency_slow_day"] < 1
        assert 0 < row["efficiency_good_day"] < 1
    # every benched 64 MiB config must clear the >=85% target with room
    for row in r["configs"]:
        if row["shard_bytes_per_device"] == 1 << 26:
            assert row["efficiency_slow_day"] > 0.99
    assert r["min_shard_bytes_eff_85"]["good_day"] < (1 << 22)
    assert ">=85%" in r["statement"]
