"""Subprocess body for tests/test_scaling.py.

XLA:CPU intermittently SEGFAULTS compiling (and serializing) the large
multi-device scaling-harness programs — a jaxlib bug, not a harness bug
(the same programs compile fine on retry). Running the harness inside the
pytest worker turns that flake into a hard xdist 'node down' crash that
kills the whole suite, so the tests exec this script in a subprocess and
retry on signal exits. Prints the run_scaling result as one JSON line on
success; any assertion/online failure exits non-zero with a traceback.

Usage: python scaling_probe.py '<json kwargs>'
"""

import json
import os
import sys

# must run before jax import in THIS process (no conftest here)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# The persistent cache stays ENABLED here: the known jaxlib crash modes
# (serialize-segfault on these big multi-device programs, deserialize-
# segfault on a bad read) kill only this isolated subprocess and the test
# retries — while a successful write makes every later CI run load the
# ~150 s of probe compiles in milliseconds. The package import below
# installs the atomic-write patch, so a crash mid-write cannot leave a
# truncated entry behind.


def main() -> int:
    kwargs = json.loads(sys.argv[1])
    device_counts = kwargs.pop("device_counts")
    from rivslam_tpu.eval import scaling

    out = scaling.run_scaling(device_counts, **kwargs)
    json.dump(out, sys.stdout)
    sys.stdout.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
