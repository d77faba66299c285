# Drop-in Make front-end mirroring the reference's targets
# (ref: /root/reference/Makefile:35-131) over the phylign_tpu CLI.
# Users of the reference can keep their `make` muscle memory; everything
# forwards to `python -m phylign_tpu.cli`.

.PHONY: all help clean cleanall download download_asms download_cobs \
        match map config report test cluster_slurm cluster_lsf \
        cluster_lsf_test format checkformat

SHELL := /usr/bin/env bash
PY ?= python
CLI := $(PY) -m phylign_tpu.cli
N ?= 4   # cluster task count

all: ## Run everything (download + match + map)
	$(CLI) all

test: ## Quick self-contained golden test (synthetic fixture)
	$(CLI) test

help: ## Print help messages
	@grep -E '^[a-z_]+:.*?## .*$$' $(MAKEFILE_LIST) | \
	  awk 'BEGIN {FS = ":.*?## "}; {printf "%-18s %s\n", $$1, $$2}'

clean: ## Clean intermediate search files
	$(CLI) clean

cleanall: ## Clean all generated and downloaded files
	$(CLI) clean --all

download: ## Download the assemblies and COBS indexes
	$(CLI) download

download_asms: ## Download only the assemblies
	$(CLI) download --only asms

download_cobs: ## Download only the COBS indexes
	$(CLI) download --only cobs

match: ## Match queries (queries -> candidates)
	$(CLI) match

map: ## Map candidates to assemblies (candidates -> alignments)
	$(CLI) map

config: ## Print resolved configuration
	$(CLI) config

report: ## Generate an HTML run report
	$(CLI) report

cluster_slurm: ## Submit a sharded run to SLURM (N=<tasks>)
	scripts/cluster_slurm.sh $(N) all

cluster_lsf: ## Submit a sharded run to LSF (N=<tasks>)
	scripts/cluster_lsf.sh $(N) all

cluster_lsf_test: ## Submit the golden test to LSF
	bsub "$(CLI) test"

format: ## Reformat Python sources
	@if $(PY) -c "import black" 2>/dev/null; then \
	  $(PY) -m black phylign_tpu tests bench.py; \
	else echo "black not installed; skipping"; fi

checkformat: ## Check source format
	@if $(PY) -c "import black" 2>/dev/null; then \
	  $(PY) -m black --check phylign_tpu tests bench.py; \
	else echo "black not installed; skipping"; fi
