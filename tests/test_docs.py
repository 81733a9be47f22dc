"""Execute every ```python block in docs/book/ (the mdBook-test analog).

The reference CI runs `mdbook test` plus a compiled tutorial crate over
its book (ref: scripts/test-mdbook.sh, CI_rs.yml:53-57,
docs/tutorial-code/). Here each chapter's python blocks run top to
bottom in one shared namespace per file, so later blocks can build on
earlier ones exactly as a reader would execute them.
"""

import pathlib

import pytest

BOOK = pathlib.Path(__file__).resolve().parent.parent / "docs" / "book"


def _python_blocks(text):
    blocks, in_block, buf = [], False, []
    for line in text.splitlines():
        if line.strip().startswith("```python"):
            in_block, buf = True, []
        elif line.strip() == "```" and in_block:
            in_block = False
            blocks.append("\n".join(buf))
        elif in_block:
            buf.append(line)
    return blocks


def _chapters():
    if not BOOK.exists():
        return []
    return sorted(p for p in BOOK.rglob("*.md")
                  if _python_blocks(p.read_text()))


@pytest.mark.parametrize(
    "path", _chapters(), ids=lambda p: str(p.relative_to(BOOK)))
def test_chapter_blocks_run(path):
    ns = {"__name__": "__docs__"}
    for i, block in enumerate(_python_blocks(path.read_text())):
        try:
            exec(compile(block, f"{path.name}[block {i}]", "exec"), ns)
        except Exception as e:
            raise AssertionError(
                f"{path.relative_to(BOOK)} block {i} failed: {e}") from e


def test_book_has_chapters():
    assert len(_chapters()) >= 15
