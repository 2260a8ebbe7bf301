# Common targets (see CLAUDE.md for environment notes)
.PHONY: test test-fast test-tpu bench examples native clean

# CPU suite env, set up-front: the parent pytest never imports the remote
# TPU backend, so the suite survives tunnel outages (the conftest re-exec
# remains as the fallback for bare `pytest` invocations)
CPU_TEST_ENV = env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
	XLA_FLAGS=--xla_force_host_platform_device_count=8 TPUMCIA_REEXECED=1

test:
	$(CPU_TEST_ENV) python -m pytest tests/ -q

# quick feedback loop: skips the compile/train-heavy tests (marked `slow`)
test-fast:
	$(CPU_TEST_ENV) python -m pytest tests/ -q -m "not slow"

# waits a tunnel outage out (bounded, 20 min) before touching the backend
test-tpu:
	python -m tpumcia.utils.outage --max-wait 1200
	TPUMCIA_TEST_BACKEND=native python -m pytest tests/ -m tpu -q

bench:
	python bench.py

examples:
	python examples/notebook_workflow.py /tmp/tpumcia_examples
	python examples/cytometry_h5.py
	python examples/cnn_workflow.py
	python examples/streaming_scale.py

native:
	g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
		native/packer.cpp -o native/libtpumcia_packer.so

clean:
	rm -rf .jax_cache native/libtpumcia_packer.so
