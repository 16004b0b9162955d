"""Fused MBConv Pallas block (ops/pallas/mbconv.py) vs the composed flax
path — numerical parity through the REAL module dispatch (interpret mode
on CPU; the composed path is itself torch-oracle-tested, so equality
here chains to the reference blocks)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from p4fr_tpu.models.efficientnetv2 import MBConv


def _run(monkeypatch, *, in_chs, out_chs, expand, se_ratio, h=8, w=16,
         b=4, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, h, w, in_chs)).astype(np.float32))
    m = MBConv(out_chs=out_chs, expand_ratio=expand, se_ratio=se_ratio,
               dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(seed), x, True)
    # non-trivial batch stats so the BN folding actually matters
    variables = dict(variables)
    variables["batch_stats"] = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(
            rng.uniform(0.05, 0.5, a.shape).astype(np.float32)
        ),
        variables["batch_stats"],
    )

    monkeypatch.setenv("P4FR_FUSED_MBCONV", "0")
    composed = m.apply(variables, x, False)
    monkeypatch.setenv("P4FR_FUSED_MBCONV", "1")
    fused = m.apply(variables, x, False)
    return np.asarray(composed), np.asarray(fused)


@pytest.mark.parametrize(
    "in_chs,out_chs,expand,se_ratio",
    [
        (32, 32, 6, 0.25),   # stage4 tail shape: residual + SE
        (16, 32, 6, 0.25),   # stage4 head (stride 1): channel change
        (32, 32, 4, 0.0),    # custom stage without SE
    ],
)
def test_fused_matches_composed(monkeypatch, in_chs, out_chs, expand,
                                se_ratio):
    composed, fused = _run(
        monkeypatch, in_chs=in_chs, out_chs=out_chs, expand=expand,
        se_ratio=se_ratio,
    )
    assert fused.shape == composed.shape
    np.testing.assert_allclose(
        fused, composed, rtol=2e-5, atol=2e-5,
        err_msg="fused MBConv diverged from the composed path",
    )


def test_chained_blocks_match_composed(monkeypatch):
    """A stage of consecutive stride-1 MBConv blocks goes through
    fused_mbconv_chain (one launch, boundary activations VMEM-resident)
    at the EfficientNetV2Blocks level; parity vs the composed stack,
    including a mid-stack channel change (no-residual link)."""
    from p4fr_tpu.models.efficientnetv2 import EfficientNetV2Blocks

    stages = (
        (1, 3, 1, 4, 16, 24, True, False),   # 16 -> 24, stride 1, SE
        (3, 3, 1, 4, 24, 24, True, False),   # 24 x3 residual chain
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 8, 16, 16)).astype(np.float32))
    m = EfficientNetV2Blocks(dtype=jnp.float32, stages=stages)
    variables = m.init(jax.random.PRNGKey(0), x, True)
    variables = dict(variables)
    variables["batch_stats"] = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(
            rng.uniform(0.05, 0.5, a.shape).astype(np.float32)
        ),
        variables["batch_stats"],
    )
    monkeypatch.setenv("P4FR_FUSED_MBCONV", "0")
    composed = m.apply(variables, x, False)
    monkeypatch.setenv("P4FR_FUSED_MBCONV", "1")
    fused = m.apply(variables, x, False)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(composed), rtol=2e-5, atol=2e-5,
        err_msg="chained fused blocks diverged from the composed stack",
    )


def test_chain_planner_groups_by_budget():
    """plan_chain splits a long run when the group's weights would not
    fit beside the working set, and never splits when they do."""
    from p4fr_tpu.ops.pallas.mbconv import plan_chain

    def fake_folded(cin, cmid, cout):
        z = {
            "pw_w": np.zeros((cin, cmid), np.float16),
            "pw_s": np.zeros(cmid, np.float32),
            "pw_b": np.zeros(cmid, np.float32),
            "dw_w": np.zeros((9, cmid), np.float32),
            "dw_s": np.zeros(cmid, np.float32),
            "dw_b": np.zeros(cmid, np.float32),
            "pwl_w": np.zeros((cmid, cout), np.float16),
            "pwl_s": np.zeros(cout, np.float32),
            "pwl_b": np.zeros(cout, np.float32),
        }
        return {k: jnp.asarray(v) for k, v in z.items()}

    small = [fake_folded(32, 128, 32)] * 4
    nb, groups = plan_chain(8, 128, 8, small)
    assert groups == [[0, 1, 2, 3]]
    # stage5-like: 14 blocks of [256,1536] weights (~4.7 MB each) must
    # split into multiple groups
    big = [fake_folded(256, 1536, 256)] * 14
    nb, groups = plan_chain(8, 128, 8, big)
    assert len(groups) > 1
    assert [i for g in groups for i in g] == list(range(14))


def test_fused_is_inference_only(monkeypatch):
    """train=True must stay on the composed path (BN batch stats update)
    even when the env forces fused."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 16)).astype(np.float32))
    m = MBConv(out_chs=16, expand_ratio=4, se_ratio=0.25,
               dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, True)
    monkeypatch.setenv("P4FR_FUSED_MBCONV", "1")
    out, mutated = m.apply(
        variables, x, True, mutable=["batch_stats"]
    )
    # composed train path ran: batch stats actually updated
    before = variables["batch_stats"]["bn1"]["mean"]
    after = mutated["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
