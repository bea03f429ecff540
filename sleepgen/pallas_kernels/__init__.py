from sleepgen.pallas_kernels.group_norm import (
    fused_group_norm_silu,
    group_norm_silu_reference,
)

__all__ = ["fused_group_norm_silu", "group_norm_silu_reference"]
from sleepgen.pallas_kernels.group_norm import group_norm_silu_tiled  # noqa: F401,E402
