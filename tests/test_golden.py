"""Golden-image regression tests: tiny fixed-seed renders compared against
stored references (tests/golden/*.npy).  Guards the estimator against silent
behavioral drift; regenerate deliberately with
`python -m tests.test_golden regen` after an intentional change."""

import os
import sys

import jax
import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _cases():
    from mc_path_tracer_tpu import configs
    from mc_path_tracer_tpu.models.integrator import RenderConfig, render

    def make(n, cfg, size=16):
        w, h = size if isinstance(size, tuple) else (size, size)
        scene, cam, _, _ = configs.ALL_CONFIGS[n]()
        return lambda: render(
            scene, cam, w, h, cfg, key=jax.random.PRNGKey(42)
        ).radiance_mean()

    return {
        "config1": make(1, RenderConfig(spp=8, max_depth=2)),
        "config2": make(2, RenderConfig(spp=8, max_depth=3)),
        "config4": make(4, RenderConfig(spp=4, max_depth=2)),
        # mid-size goldens: 64x64 at real depth pins the full estimator
        # (MIS + env CDF + RR) at a scale where spatial structure shows
        "config1_64": make(1, RenderConfig(spp=8, max_depth=2), 64),
        "config2_64": make(2, RenderConfig(spp=4, max_depth=3), 64),
        "config3_64": make(3, RenderConfig(spp=4, max_depth=3), 64),
        # downsampled config5 (the 1080p/250spp rung's scene): pins the
        # ~100k-tri LBVH + streaming-traversal chain to a CPU-verified
        # golden (VERDICT r4 #7); 96x54 keeps the 16:9 framing
        "config5_96x54": make(5, RenderConfig(spp=2, max_depth=3), (96, 54)),
    }


def test_golden_images():
    cases = _cases()
    missing = [k for k in cases if not os.path.exists(
        os.path.join(GOLDEN_DIR, f"{k}.npy"))]
    assert not missing, (
        f"golden files missing: {missing}; run `python tests/test_golden.py regen`"
    )
    for name, fn in cases.items():
        got = np.asarray(fn())
        want = np.load(os.path.join(GOLDEN_DIR, f"{name}.npy"))
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-5,
            err_msg=f"golden mismatch: {name} (estimator behavior changed; "
                    f"regenerate only if the change is intentional)",
        )


def regen(only=None):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, fn in _cases().items():
        if only and name not in only:
            continue
        out = np.asarray(fn())
        np.save(os.path.join(GOLDEN_DIR, f"{name}.npy"), out)
        print(f"wrote {name}: mean={out.mean():.5f}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        import conftest  # noqa: F401  (force CPU platform)

        regen(only=sys.argv[2:] or None)
    else:
        print("usage: python tests/test_golden.py regen [names...]")