"""Importer key maps frozen against vendored real-file key inventories.

The reference pulls two pretrained files at model construction: timm's
``tf_efficientnetv2_s`` weights (reference: networks/EfficientSATRN.py:66)
and Microsoft's ``swin_base_patch4_window12_384_22k.pth``
(networks/SWIN.py:1028-1034). This environment has no network access, so
``tests/fixtures/*.txt`` vendor the EXACT state_dict key names of those
files, transcribed from source:

- timm/models/efficientnet.py v2_s arch_def (cn_r2_k3_s1_e1_c24,
  er_r4_k3_s2_e4_c48, er_r4_k3_s2_e4_c64, ir_r6_k3_s2_e4_c128_se0.25,
  ir_r9_k3_s1_e6_c160_se0.25, ir_r15_k3_s2_e6_c256_se0.25) plus
  stem/head/classifier; torch BN contributes num_batches_tracked.
- microsoft/Swin-Transformer models/swin_transformer.py at base/384:
  depths (2,2,18,2), persistent buffers relative_position_index (every
  block) and attn_mask (odd blocks whose stage resolution 96/48/24
  exceeds window 12 — stage 3 at 12 never shifts).

These tests pin the rule tables to that inventory: every key must match
exactly one rule, targets must not collide, and the drops must be only
the documented non-weight keys — so key-map drift is caught here instead
of on the first real checkpoint (utils/convert_pth.py:426-508).
"""

import os
import re

from p4fr_tpu.utils.convert_pth import (
    swin_hub_rules,
    timm_efficientnetv2_rules,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _load_keys(name):
    with open(os.path.join(FIXTURES, name)) as f:
        return [line.strip() for line in f if line.strip()]


def _match_all(rules, keys):
    """-> (targets {key: (coll, path)}, unmatched [key])."""
    compiled = [(re.compile(p), r, c) for p, r, _, c in rules]
    targets, unmatched = {}, []
    for key in keys:
        for pat, repl, coll in compiled:
            if pat.match(key):
                targets[key] = (coll, pat.sub(repl, key))
                break
        else:
            unmatched.append(key)
    return targets, unmatched


def _check(rules, keys, expected_drops):
    targets, unmatched = _match_all(rules, keys)
    assert unmatched == [], f"rule table drifted; unmatched: {unmatched[:8]}"
    dropped = sorted(k for k, (c, _) in targets.items() if c == "drop")
    kept = {k: v for k, v in targets.items() if v[0] != "drop"}
    # only the documented non-weight keys may be dropped
    for k in dropped:
        assert any(re.fullmatch(p, k) for p in expected_drops), (
            f"unexpected drop: {k}"
        )
    # every kept key lands on a unique (collection, flax path)
    seen = {}
    for k, tgt in kept.items():
        assert tgt not in seen, f"collision: {k} and {seen[tgt]} -> {tgt}"
        seen[tgt] = k
    return kept, dropped


def test_timm_efficientnetv2_s_key_inventory_frozen():
    keys = _load_keys("timm_tf_efficientnetv2_s_keys.txt")
    assert len(keys) == 782  # catch accidental fixture edits
    kept, dropped = _check(
        timm_efficientnetv2_rules(),
        keys,
        expected_drops=[
            r".*\.num_batches_tracked",
            r"conv_stem\.weight", r"bn1\..*",          # reference keeps
            r"conv_head\.weight", r"bn2\..*",          # only m.blocks
            r"classifier\.(weight|bias)",              # (EfficientSATRN.py:66-80)
        ],
    )
    # running stats route to batch_stats, weights/biases to params
    for k, (coll, path) in kept.items():
        want = "batch_stats" if k.endswith(("running_mean", "running_var")) \
            else "params"
        assert coll == want, (k, coll)
        assert path.startswith("stage"), (k, path)
    # 40 blocks (2+4+4+6+9+15), every one contributes at least conv+bn1
    blocks = {p.split("/")[0] for _, (c, p) in kept.items()}
    assert len(blocks) == 40, sorted(blocks)[:5]


def test_swin_hub_key_inventory_frozen():
    keys = _load_keys("swin_base_patch4_window12_384_22k_keys.txt")
    assert len(keys) == 364
    kept, dropped = _check(
        swin_hub_rules(),
        keys,
        expected_drops=[
            r".*\.attn\.relative_position_index",  # recomputed from shape
            r".*\.attn_mask",                      # recomputed from shape
            r"head\.(weight|bias)",                # classifier unused
        ],
    )
    # 11 shifted blocks carry an attn_mask buffer (stage3 at res 12 ==
    # window 12 never shifts)
    assert sum(1 for k in dropped if k.endswith("attn_mask")) == 11
    for k, (coll, path) in kept.items():
        assert coll == "params", (k, coll)  # Swin has no BN
    # 24 blocks across depths (2,2,18,2) + 3 patch-merge stages
    blocks = {p.split("/")[0] for _, (c, p) in kept.items()
              if p.startswith("stage") and "_block" in p.split("/")[0]}
    merges = {p.split("/")[0] for _, (c, p) in kept.items()
              if "_merge" in p.split("/")[0]}
    assert len(blocks) == 24 and len(merges) == 3
