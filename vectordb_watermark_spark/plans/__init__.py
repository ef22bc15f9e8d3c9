"""End-to-end embed/extract pipelines and the watermark codec."""
