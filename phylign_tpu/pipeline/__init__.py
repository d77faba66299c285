"""End-to-end pipeline: stages, resource-aware scheduler, resume, download."""
