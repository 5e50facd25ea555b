"""The test harness must run on the virtual 8-device CPU mesh."""

import jax


def test_eight_cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8, devs
    assert all(d.platform == "cpu" for d in devs)
