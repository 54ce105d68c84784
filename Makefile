.PHONY: test test-all golden bench clean

test:
	python -m pytest tests/ -q

test-all:
	python -m pytest tests/ -q -m "not tpu"
	python -m pytest tests/ -q -m slow

golden:
	$(MAKE) -C turbotpu/golden/cpp

bench:
	python bench.py

clean:
	$(MAKE) -C turbotpu/golden/cpp clean
	find . -name __pycache__ -type d -exec rm -rf {} +
