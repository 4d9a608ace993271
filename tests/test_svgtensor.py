"""Tests for the core SVG tensor contract: packing, masks, rel<->abs transforms.

The relative/absolute transforms are differential-tested against a direct
numpy re-derivation of the reference semantics (difflib/tensor.py:172-189,
model/model.py:461-479) using boolean indexing, exactly as the reference does.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from deepsvg_tpu.svgtensor import (
    ARGS_DIM,
    CMD_ARGS_MASK_NP,
    CMD_C,
    CMD_EOS,
    CMD_L,
    CMD_M,
    CMD_SOS,
    CMD_Z,
    IndexArgs,
    N_ARGS,
    PAD_VAL,
    group_mask,
    key_padding_mask,
    make_absolute,
    mask_invalid_args,
    pack_groups,
    pack_sequence,
    padding_mask,
    relative_args,
    sequence_lengths,
    visibility_mask,
)


def random_sequence(rng, n_real, s_total):
    """Random packed sequence: SOS + n_real real cmds + EOS + pad."""
    cmds = rng.choice([CMD_M, CMD_L, CMD_C], size=n_real).astype(np.int32)
    cmds[0] = CMD_M
    args = np.full((n_real, N_ARGS), PAD_VAL, dtype=np.float32)
    for i, c in enumerate(cmds):
        m = CMD_ARGS_MASK_NP[c] > 0
        args[i, m] = rng.integers(0, ARGS_DIM, size=m.sum())
    return pack_sequence(cmds, args, s_total)


# --- reference-semantics reimplementation (numpy, boolean indexing) ---------


def ref_relative_args(commands, args):
    data = args.copy()
    real = commands < CMD_EOS
    d = data[real]
    start = d[:-1, IndexArgs.END_POS].copy()
    d[1:, IndexArgs.CONTROL1] -= start
    d[1:, IndexArgs.CONTROL2] -= start
    d[1:, IndexArgs.END_POS] -= start
    data[real] = d
    mask = CMD_ARGS_MASK_NP[commands].astype(bool)
    data[mask] += ARGS_DIM - 1
    data[~mask] = PAD_VAL
    return data


def ref_make_absolute(commands, args):
    args = args.copy()
    real = commands < CMD_EOS
    a = args[real]
    end_pos = np.cumsum(a[:-1, IndexArgs.END_POS], axis=0)
    a[1:, IndexArgs.CONTROL1] += end_pos
    a[1:, IndexArgs.CONTROL2] += end_pos
    a[1:, IndexArgs.END_POS] += end_pos
    args[real] = a
    mask = CMD_ARGS_MASK_NP[commands].astype(bool)
    args[~mask] = PAD_VAL
    return args


# ---------------------------------------------------------------------------


class TestPacking:
    def test_pack_sequence_layout(self, rng):
        cmds, args = random_sequence(rng, n_real=5, s_total=10)
        assert cmds.shape == (10,)
        assert args.shape == (10, N_ARGS)
        assert cmds[0] == CMD_SOS
        assert cmds[6] == CMD_EOS  # first EOS right after content
        assert (cmds[6:] == CMD_EOS).all()
        assert (args[0] == PAD_VAL).all()  # SOS row is padding
        assert (args[6:] == PAD_VAL).all()

    def test_pack_groups_shapes(self, rng):
        g, s, t = 4, 6, 20
        tensors = [np.zeros((3, 14), np.float32), np.zeros((5, 14), np.float32)]
        for ten in tensors:
            ten[:, 0] = CMD_L
        out = pack_groups(tensors, g, s, t)
        assert out["commands"].shape == (g, s + 2)
        assert out["args"].shape == (g, s + 2, N_ARGS)
        assert out["commands_grouped"].shape == (1, t + 2)
        assert out["args_grouped"].shape == (1, t + 2, N_ARGS)
        assert out["args_rel"].shape == (g, s + 2, N_ARGS)
        assert out["filling"].shape == (g, 1)
        # empty groups are SOS + all-EOS
        assert out["commands"][2, 0] == CMD_SOS
        assert (out["commands"][2, 1:] == CMD_EOS).all()
        assert not visibility_mask(jnp.asarray(out["commands"]))[2]
        assert visibility_mask(jnp.asarray(out["commands"]))[0]

    def test_truncation(self):
        cmds = np.full(30, CMD_L, np.int32)
        args = np.zeros((30, N_ARGS), np.float32)
        c, a = pack_sequence(cmds, args, 10)
        assert c.shape == (10,)
        assert (c[1:9] == CMD_L).all() and c[9] == CMD_EOS


class TestMasks:
    def test_padding_mask_basic(self, rng):
        cmds, _ = random_sequence(rng, n_real=4, s_total=12)
        m = np.asarray(padding_mask(jnp.asarray(cmds)))
        # SOS + 4 real = 5 ones, then zeros
        assert (m == np.array([1] * 5 + [0] * 7, np.float32)).all()
        assert sequence_lengths(jnp.asarray(cmds)) == 5

    def test_padding_mask_extended_shifts_by_3(self, rng):
        """The reference 'extended' mask adds mask[i-3] (model/utils.py:26-28)."""
        cmds, _ = random_sequence(rng, n_real=4, s_total=12)
        m = np.asarray(padding_mask(jnp.asarray(cmds), extended=True))
        base = np.array([1] * 5 + [0] * 7, np.float32)
        expected = base.copy()
        expected[3:] = np.clip(expected[3:] + base[:-3], 0, 1)
        assert (m == expected).all()

    def test_key_padding_mask(self, rng):
        cmds, _ = random_sequence(rng, n_real=4, s_total=12)
        k = np.asarray(key_padding_mask(jnp.asarray(cmds)))
        assert (~k[:5]).all() and k[5:].all()

    def test_group_mask_counts_movetos(self):
        cmds = jnp.asarray([CMD_SOS, CMD_M, CMD_L, CMD_M, CMD_C, CMD_EOS])
        g = np.asarray(group_mask(cmds))
        assert (g == [0, 1, 1, 2, 2, 2]).all()

    def test_visibility(self):
        s = 8
        empty = jnp.asarray([CMD_SOS] + [CMD_EOS] * (s - 1))
        full = jnp.asarray([CMD_SOS, CMD_M, CMD_L] + [CMD_EOS] * (s - 3))
        assert not visibility_mask(empty)
        assert visibility_mask(full)

    def test_batched(self, rng):
        cmds = np.stack([random_sequence(rng, n, 12)[0] for n in (2, 5, 7)])
        m = padding_mask(jnp.asarray(cmds))
        assert m.shape == (3, 12)
        assert (np.asarray(sequence_lengths(jnp.asarray(cmds))) == [3, 6, 8]).all()


class TestRelAbs:
    @pytest.mark.parametrize("n_real", [1, 3, 8])
    def test_relative_matches_reference(self, rng, n_real):
        cmds, args = random_sequence(rng, n_real, 12)
        expected = ref_relative_args(cmds, args)
        got = np.asarray(relative_args(jnp.asarray(cmds), jnp.asarray(args)))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_relative_batched(self, rng):
        seqs = [random_sequence(rng, n, 12) for n in (1, 4, 6)]
        cmds = np.stack([s[0] for s in seqs])
        args = np.stack([s[1] for s in seqs])
        got = np.asarray(relative_args(jnp.asarray(cmds), jnp.asarray(args)))
        for i, (c, a) in enumerate(seqs):
            np.testing.assert_allclose(got[i], ref_relative_args(c, a), atol=1e-5)

    @pytest.mark.parametrize("n_real", [1, 3, 8])
    def test_absolute_matches_reference(self, rng, n_real):
        cmds, _ = random_sequence(rng, n_real, 12)
        # delta-valued args in [-20, 20]
        args = rng.integers(-20, 20, size=(12, N_ARGS)).astype(np.float32)
        expected = ref_make_absolute(cmds, args)
        got = np.asarray(make_absolute(jnp.asarray(cmds), jnp.asarray(args)))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_rel_abs_roundtrip(self, rng):
        """relative_args then (unshift + make_absolute) restores masked args."""
        cmds, args = random_sequence(rng, 6, 12)
        rel = np.asarray(relative_args(jnp.asarray(cmds), jnp.asarray(args)))
        deltas = rel - (ARGS_DIM - 1)  # undo encode shift
        back = np.asarray(make_absolute(jnp.asarray(cmds), jnp.asarray(deltas)))
        mask = CMD_ARGS_MASK_NP[cmds].astype(bool)
        np.testing.assert_allclose(back[mask], args[mask], atol=1e-4)
        assert (back[~mask] == PAD_VAL).all()

    def test_mask_invalid_args(self):
        cmds = jnp.asarray([CMD_L, CMD_C, CMD_Z])
        args = jnp.ones((3, N_ARGS))
        out = np.asarray(mask_invalid_args(cmds, args))
        assert (out[0][:9] == PAD_VAL).all() and (out[0][9:] == 1).all()
        assert (out[1][:5] == PAD_VAL).all() and (out[1][5:] == 1).all()
        assert (out[2] == PAD_VAL).all()


class TestSVGTensorWrapper:
    """The drop-in SVGTensor object API (reference difflib/tensor.py surface)."""

    def test_round_trip_and_seq_ops(self, rng):
        from deepsvg_tpu.svgtensor import SVGTensor

        cmds, args = random_sequence(rng, 4, 6)
        # strip SOS/padding to emulate raw content
        t = SVGTensor.from_cmd_args(cmds[1:5], args[1:5])
        assert len(t) == 4
        t.add_eos().add_sos().pad(seq_len=8)
        assert len(t) == 8
        assert t.cmds()[0] == CMD_SOS and t.cmds()[-1] == CMD_EOS
        t.unpad().drop_sos()
        assert len(t) == 4
        np.testing.assert_allclose(t.args(), args[1:5])

    def test_data_14col_round_trip(self, rng):
        from deepsvg_tpu.svgtensor import SVGTensor

        cmds, args = random_sequence(rng, 5, 7)
        t = SVGTensor.from_cmd_args(cmds, args)
        t2 = SVGTensor.from_data(t.data)
        np.testing.assert_allclose(t2.cmds(), t.cmds())
        np.testing.assert_allclose(t2.args(), t.args())

    def test_relative_args_matches_functional(self, rng):
        from deepsvg_tpu.svgtensor import SVGTensor

        cmds, args = random_sequence(rng, 5, 9)
        t = SVGTensor.from_cmd_args(cmds, args)
        np.testing.assert_allclose(
            t.get_relative_args(), ref_relative_args(cmds, args), atol=1e-5
        )

    def test_sample_points(self, rng):
        from deepsvg_tpu.svgtensor import SVGTensor

        cmds, args = random_sequence(rng, 4, 8)
        t = SVGTensor.from_cmd_args(cmds, args)
        p = t.sample_points(n=5)
        assert p.ndim == 2 and p.shape[1] == 2


class TestDifflibViz:
    def test_plot_points(self, rng):
        from deepsvg_tpu.difflib import plot_points

        img = plot_points(rng.random((20, 2)), viewbox=(24, 24),
                          show_color=True, return_img=True)
        assert img.size[0] > 0

    def test_plot_matching(self, rng):
        from deepsvg_tpu.difflib import plot_matching

        p1 = rng.random((30, 2))
        p2 = rng.random((30, 2))
        img = plot_matching(p1, p2, np.arange(30), return_img=True)
        assert img.size[0] > 0


class TestHostDevParity:
    def test_relative_args_np_matches_jax(self, rng):
        """The host packer's numpy rel-encoding must match the jit version."""
        from deepsvg_tpu.svgtensor.tensor import relative_args_np

        for n in (1, 3, 7):
            cmds, args = random_sequence(rng, n, 12)
            np_out = relative_args_np(cmds, args)
            jx_out = np.asarray(relative_args(jnp.asarray(cmds), jnp.asarray(args)))
            np.testing.assert_allclose(np_out, jx_out, atol=1e-5)
