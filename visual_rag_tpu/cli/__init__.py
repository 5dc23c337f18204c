"""Command-line interface: visual-rag-tpu process | search | info."""
