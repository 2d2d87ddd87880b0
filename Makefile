# Developer entry points (mirrors the reference's doc/wheel workflows,
# /root/reference/.github/workflows/{documentation,wheels}.yml).

.PHONY: test test-fast docs wheel clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow and not golden"

docs:
	python tools/build_docs.py docs/html

wheel:
	python -m build --wheel 2>/dev/null || pip wheel --no-deps -w dist .

clean:
	rm -rf docs/html dist build *.egg-info
