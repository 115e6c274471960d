"""Deployment hygiene: the core pipeline must run with torch, scipy, and
matplotlib entirely absent (they are test oracles / optional extras, not
runtime dependencies). Runs in a subprocess with the imports blocked."""

import subprocess
import sys
import textwrap


def test_core_paths_importable_without_optional_deps(tmp_path):
    # a REAL torch-saved state dict (with the OrderedDict _metadata BUILD
    # that plain-dict unpicklers choke on), created while torch is still
    # importable, for the subprocess to ingest torch-free
    import numpy as np
    import torch

    from tests.torch_fixture import make_state_dict

    sd = make_state_dict(np.random.RandomState(0), (4, 8))
    torch.save(
        {k: torch.from_numpy(v) for k, v in sd.items()}, str(tmp_path / "ref.pth")
    )

    script = textwrap.dedent(
        """
        import sys

        class Blocker:
            BLOCKED = ("torch", "scipy", "matplotlib", "torchvision")
            def find_module(self, name, path=None):
                if name.split(".")[0] in self.BLOCKED:
                    return self
            def find_spec(self, name, path=None, target=None):
                if name.split(".")[0] in self.BLOCKED:
                    raise ImportError(f"{name} blocked for this test")
        sys.meta_path.insert(0, Blocker())

        import numpy as np
        import jax, jax.numpy as jnp

        # ops + model + inference end to end
        from gelslim_depth_tpu import ops
        from gelslim_depth_tpu.config import GelslimConfig
        from gelslim_depth_tpu.models.unet import init_unet
        from gelslim_depth_tpu.inference import Predictor

        cfg = GelslimConfig(CNN_dimensions=(4, 8), input_tactile_image_size=(8, 11),
                            depth_normalization_parameters=(-1.9, 0.0))
        params, stats = init_unet(jax.random.PRNGKey(0), cfg.unet_config())
        pred = Predictor(cfg, params, stats)
        out = pred.predict_depth_from_RGB(np.full((1, 3, 16, 22), 127.0, np.float32), (16, 22))
        assert np.isfinite(np.asarray(out)).all()

        # torch-free .pt write + read round trip
        from gelslim_depth_tpu.data.pt_io import load_pt, save_pt
        d = {"tactile_image": np.zeros((2, 6, 8, 9), np.float32)}
        save_pt(d, "no_torch.pt")
        back = load_pt("no_torch.pt")
        assert back["tactile_image"].shape == (2, 6, 8, 9)

        # torch-free ingestion of a genuine torch.save state dict (the
        # published-artifact migration path with torch absent)
        pred2 = Predictor.from_torch_checkpoint("ref.pth", cfg)
        out2 = pred2.predict_depth_from_RGB(np.full((1, 3, 16, 22), 127.0, np.float32), (16, 22))
        assert np.isfinite(np.asarray(out2)).all()

        # training step
        from gelslim_depth_tpu.train import create_train_state, make_optimizer, make_train_step
        opt = make_optimizer()
        state = create_train_state(jax.random.PRNGKey(0), cfg.unet_config(), opt)
        step = jax.jit(make_train_step(cfg.unet_config(), opt))
        x = jnp.zeros((2, 3, 16, 22)); y = jnp.zeros((2, 1, 16, 22))
        state, loss = step(state, x, y)
        assert float(loss) == float(loss)

        # mesh GT generation (STL + sampling + render)
        from gelslim_depth_tpu.meshgen import save_stl_binary, load_stl, sample_surface_points
        from gelslim_depth_tpu.meshgen.depth_render import plane_spec, render_depth_pair
        tri = np.asarray([[[0,0,0],[0,10,0],[0,0,10]], [[5,0,0],[5,10,0],[5,0,10]]], np.float32)
        save_stl_binary("t.stl", tri)
        pts = sample_surface_points(load_stl("t.stl"), 1000)
        r, l = render_depth_pair(jnp.asarray(pts), jnp.float32(0), jnp.float32(0), jnp.float32(0),
                                 jnp.float32(4.0), spec=plane_spec("+y+z"),
                                 image_size=(16, 21), mm_per_pixel=1.0, fill_iters=2)
        assert np.isfinite(np.asarray(r)).all()
        print("NO-TORCH-OK")
        """
    )
    r = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, cwd=str(tmp_path),
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "HOME": str(tmp_path),
             "PYTHONPATH": __file__.rsplit("/tests/", 1)[0]},
        timeout=420,
    )
    assert "NO-TORCH-OK" in r.stdout, f"stdout: {r.stdout[-2000:]}\nstderr: {r.stderr[-3000:]}"
