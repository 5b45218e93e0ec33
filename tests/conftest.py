"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-world analogue of the reference's ``mpirun -n 12`` local
testing (/root/reference/examples/Makefile:1): multi-device semantics are
exercised without hardware via XLA's host-platform device splitting.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
