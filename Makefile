# Developer entry points. All test targets force the CPU backend
# (hermetic); bench targets use the real accelerator.

.PHONY: test test-fast parity fixture bench bench-kernels bench-preprocess \
        bench-serving demo-pipeline smoke sanity train-fixture lint-clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

parity:
	python -m pytest tests/test_parity.py -q

fixture:
	python scripts/make_fixture.py

bench:
	python bench.py

bench-kernels:
	python scripts/bench_kernels.py

bench-preprocess:
	python scripts/bench_preprocess.py

bench-scaling:
	python scripts/bench_scaling.py

bench-serving:
	python scripts/bench_serving.py

demo-pipeline:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	    python scripts/demo_pipeline.py --cpu

smoke:
	python scripts/smoke_test_v2.py

sanity:
	python scripts/sanity_check.py

train-fixture:
	ULTRAFND_DISABLE_HF=1 python run_train_eval.py \
	    --data_root tests/fixtures/fakesv_tiny --out_dir /tmp/ultrafnd_out \
	    --epochs 3 --batch_size 8 --cpu
