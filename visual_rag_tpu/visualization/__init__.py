"""Visualization: saliency maps over page tile grids."""

from visual_rag_tpu.visualization.saliency import (  # noqa: F401
    create_saliency_overlay,
    generate_saliency_map,
    visualize_search_results,
)
