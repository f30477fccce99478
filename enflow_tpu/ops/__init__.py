from .edge_kernel import fused_edge_pipeline, pallas_available
