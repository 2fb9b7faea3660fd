.PHONY: native test bench entry clean

native:
	./native/build.sh

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

entry:
	python __graft_entry__.py

clean:
	rm -f sailfish_tpu/_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
