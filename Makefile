# Developer entry points (the role of the reference's scripts/*.sh,
# /root/reference/scripts/{build-python,convert-models,quantize-models,format}.sh)

PY ?= python

.PHONY: test test-tpu bench bench-variants smoke-multihost native clean

test:                ## unit + integration suite on CPU (8 virtual devices)
	$(PY) -m pytest tests/ -q

test-tpu:            ## same suite against the real TPU backend
	CLIP_TPU_TEST_TPU=1 $(PY) -m pytest tests/ -q

bench:               ## driver headline metric (one JSON line)
	$(PY) bench.py

bench-variants:      ## throughput table across all model variants
	$(PY) scripts/bench_variants.py

smoke-multihost:     ## 2-process jax.distributed validation (CPU)
	$(PY) scripts/multihost_cpu_smoke.py

smoke-multihost-serve: ## 2-host HTTP serving over one global mesh (CPU)
	$(PY) scripts/multihost_serve_smoke.py

native:              ## (re)build the C++ preprocessing library
	$(PY) -c "from clip_tpu import native; native._build() and print('built', native._LIB)"

clean:
	rm -rf .cache __pycache__ clip_tpu/native/*.so
	find . -name '__pycache__' -type d -prune -exec rm -rf {} +
