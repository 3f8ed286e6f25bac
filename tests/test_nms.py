"""Matrix-NMS semantics the drivers rely on.

test_fs.py runs NMS once per (class, run) pass with `cats = zeros` —
within a pass every proposal shares the class, so the same-label gate is
trivially true. The reference does the same per-class loop (test_fs.py's
per-class NMS). This pins the implicit claim: per-class separate NMS runs
are EQUIVALENT to one joint run over the concatenation with true category
labels, because matrix NMS only decays scores between same-label pairs
(util/utils_3d.py:95-141).
"""

import numpy as np
import jax.numpy as jnp

from geoformer_tpu.ops.nms import matrix_nms


def test_per_class_nms_equals_joint_nms():
    rng = np.random.default_rng(5)
    n_per, npts = 12, 400
    masks, scores, cats = [], [], []
    for cls in range(2):
        base = (rng.uniform(0, 1, (3, npts)) > 0.6).astype(np.float32)
        m = base[rng.integers(0, 3, n_per)]
        flip = rng.uniform(0, 1, m.shape) < 0.08
        m = np.clip(m + flip, 0, 1).astype(np.float32)  # overlapping variants
        masks.append(m)
        scores.append(rng.uniform(0.2, 1.0, n_per).astype(np.float32))
        cats.append(np.full(n_per, cls, np.int32))
    masks_j = np.concatenate(masks)
    scores_j = np.concatenate(scores)
    cats_j = np.concatenate(cats)
    valid = np.ones(2 * n_per, bool)

    keep_joint, sc_joint = matrix_nms(
        jnp.asarray(masks_j), jnp.asarray(scores_j), jnp.asarray(cats_j),
        jnp.asarray(valid), sigma=2.0, final_score_thresh=0.3,
    )
    keep_joint, sc_joint = np.asarray(keep_joint), np.asarray(sc_joint)

    for cls in range(2):
        keep_c, sc_c = matrix_nms(
            jnp.asarray(masks[cls]), jnp.asarray(scores[cls]),
            jnp.asarray(np.zeros(n_per, np.int32)),  # the test_fs.py convention
            jnp.asarray(np.ones(n_per, bool)), sigma=2.0, final_score_thresh=0.3,
        )
        sl = slice(cls * n_per, (cls + 1) * n_per)
        np.testing.assert_array_equal(np.asarray(keep_c), keep_joint[sl])
        np.testing.assert_allclose(np.asarray(sc_c), sc_joint[sl], rtol=1e-6)
