PY ?= python

.PHONY: test test-fast bench demo app native serve clean

test:            ## full suite (CPU, virtual 8-device mesh)
	$(PY) -m pytest tests/ -q

test-fast:       ## skip the reference-oracle golden tests
	$(PY) -m pytest tests/ -q --ignore=tests/test_mingtok_golden.py \
	  --ignore=tests/test_llm_golden.py --ignore=tests/test_rf_golden.py \
	  --ignore=tests/test_rope_scaling.py --ignore=tests/test_convert_e2e.py

bench:           ## driver benchmark (one JSON line, real chip)
	$(PY) bench.py

bench-all:       ## per-component benchmarks (real chip)
	$(PY) benchmarks/bench_components.py
	$(PY) benchmarks/bench_t2i.py --layers 8 --tokens 16
	$(PY) benchmarks/bench_talker.py --tiny

demo:            ## 4-workload unified demo on a tiny random model
	$(PY) examples/test_infer_unified.py --tiny --max-new-tokens 16

app:             ## CLI chat app (tiny random model)
	$(PY) app.py --tiny

serve:           ## HTTP server on :8816 (tiny random model)
	$(PY) -m mingunivision_tpu.serving.launch --tiny --port 8816

native:          ## build the C++ IO runtime
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
