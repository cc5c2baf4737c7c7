"""JAX_PLATFORMS env contract (fast_srgan_tpu/utils/platforms.py).

This environment's sitecustomize force-sets ``jax.config.jax_platforms``
programmatically, which outranks the JAX_PLATFORMS env var — so the
documented CPU recipes (``JAX_PLATFORMS=cpu python train.py ...``) would
silently dial the TPU tunnel and hang during outages. These tests pin
the restored contract: the env var wins when set, nothing changes when
it is unset.
"""

import os
import subprocess
import sys

import jax

from fast_srgan_tpu.utils.platforms import honor_env_platforms

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestHonorEnvPlatforms:
    def test_noop_when_env_unset(self, monkeypatch):
        monkeypatch.delenv("JAX_PLATFORMS", raising=False)
        before = jax.config.jax_platforms
        assert honor_env_platforms() is None
        assert jax.config.jax_platforms == before

    def test_noop_when_already_in_effect(self, monkeypatch):
        # conftest pins this process to cpu; env agreeing is a no-op.
        monkeypatch.setenv("JAX_PLATFORMS", jax.config.jax_platforms)
        assert honor_env_platforms() is None

    def test_env_overrides_programmatic_force_set(self):
        # Reproduce the sitecustomize scenario in a clean child process
        # WITHOUT the axon boot (PALLAS_AXON_POOL_IPS stripped, so no
        # tunnel dial): config force-set to a non-cpu list, env says cpu,
        # honor_env_platforms() must make the env win before device init.
        env = {
            k: v for k, v in os.environ.items()
            if k not in ("PALLAS_AXON_POOL_IPS", "PYTHONPATH")
        }
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO
        code = (
            "import jax\n"
            # simulate the sitecustomize programmatic override
            "jax.config.update('jax_platforms', 'tpu,cpu')\n"
            "from fast_srgan_tpu.utils.platforms import honor_env_platforms\n"
            "assert honor_env_platforms() == 'cpu'\n"
            "assert jax.config.jax_platforms == 'cpu'\n"
            "assert jax.devices()[0].platform == 'cpu'\n"
            "print('OK')\n"
        )
        out = subprocess.run(
            [sys.executable, "-c", code],
            env=env, capture_output=True, text=True, timeout=120,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "OK" in out.stdout

    def test_warns_and_noops_after_backend_init(self):
        # Once a backend exists, platform selection is frozen: the helper
        # must leave the config alone AND warn — a silently-ignored
        # JAX_PLATFORMS is the failure mode the module exists to kill.
        env = {
            k: v for k, v in os.environ.items()
            if k not in ("PALLAS_AXON_POOL_IPS", "PYTHONPATH")
        }
        env["JAX_PLATFORMS"] = ""  # child picks cpu by default
        env["PYTHONPATH"] = REPO
        code = (
            "import warnings\n"
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "jax.devices()\n"  # initialize the backend: selection frozen
            "import os\n"
            "os.environ['JAX_PLATFORMS'] = 'tpu'\n"
            "from fast_srgan_tpu.utils.platforms import honor_env_platforms\n"
            "with warnings.catch_warnings(record=True) as w:\n"
            "    warnings.simplefilter('always')\n"
            "    assert honor_env_platforms() is None\n"
            "assert jax.config.jax_platforms == 'cpu'\n"
            "assert any('already initialized' in str(x.message) for x in w)\n"
            "print('OK')\n"
        )
        out = subprocess.run(
            [sys.executable, "-c", code],
            env=env, capture_output=True, text=True, timeout=120,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "OK" in out.stdout
