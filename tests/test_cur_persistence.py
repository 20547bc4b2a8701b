"""CUR index save/load round trip."""

import numpy as np

from anncur_tpu.core.cur import build_cur_from_matrix, load_cur_index, save_cur_index


def test_index_roundtrip(tmp_path, low_rank_factory):
    mat = low_rank_factory(n=40, m=60, rank=5)
    idx = build_cur_from_matrix(mat, np.arange(0, 40, 5), np.arange(0, 60, 6))
    path = str(tmp_path / "index.pkl")
    save_cur_index(path, idx)
    idx2 = load_cur_index(path)
    np.testing.assert_allclose(np.asarray(idx2.latent_cols), np.asarray(idx.latent_cols))
    np.testing.assert_array_equal(np.asarray(idx2.col_idxs), np.asarray(idx.col_idxs))
    assert idx2.approx_preference == idx.approx_preference
    np.testing.assert_allclose(
        np.asarray(idx2.reconstruct()), np.asarray(idx.reconstruct()), rtol=1e-6
    )
