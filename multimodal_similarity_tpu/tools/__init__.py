"""Migration / maintenance CLIs (``python -m multimodal_similarity_tpu
tools.<name>``)."""
