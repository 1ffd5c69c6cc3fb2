// Paged KV-cache block allocator.
//
// Native runtime component (role: the memory-management layer a serving
// framework keeps out of Python — the reference has no runtime at all, so
// this is north-star infrastructure; SURVEY.md §7.1 "paged KV-cache
// blocks feed a continuous-batching decode loop").
//
// Host-side only: tracks which device pool pages belong to which
// sequence. The device never sees this structure — Python reads the page
// tables out and ships them to the Pallas kernel as int32 arrays via
// scalar prefetch.
//
// Design: O(1) page alloc/free via a free-list stack; per-sequence page
// vectors; copy-on-write sharing (prefix sharing for beam/parallel
// sampling) via per-page refcounts.

#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

namespace {

struct Sequence {
  std::vector<int32_t> pages;
  int32_t length = 0;     // tokens in use
  bool live = false;
};

struct PagedAllocator {
  int32_t num_pages;
  int32_t page_size;
  std::vector<int32_t> free_stack;      // available page ids
  std::vector<int32_t> refcount;        // per page
  std::vector<Sequence> seqs;
  std::mutex mu;

  PagedAllocator(int32_t pages, int32_t psize, int32_t max_seqs)
      : num_pages(pages), page_size(psize), refcount(pages, 0),
        seqs(max_seqs) {
    free_stack.reserve(pages);
    for (int32_t i = pages - 1; i >= 0; --i) free_stack.push_back(i);
  }

  int32_t pages_needed(int32_t tokens) const {
    return (tokens + page_size - 1) / page_size;
  }
};

}  // namespace

extern "C" {

PagedAllocator* pa_create(int32_t num_pages, int32_t page_size,
                          int32_t max_seqs) {
  if (num_pages <= 0 || page_size <= 0 || max_seqs <= 0) return nullptr;
  return new PagedAllocator(num_pages, page_size, max_seqs);
}

void pa_destroy(PagedAllocator* pa) { delete pa; }

int32_t pa_num_free_pages(PagedAllocator* pa) {
  std::lock_guard<std::mutex> l(pa->mu);
  return static_cast<int32_t>(pa->free_stack.size());
}

int32_t pa_page_size(PagedAllocator* pa) { return pa->page_size; }

// Allocate a sequence slot with capacity for `tokens`. Returns seq_id or
// -1 (no slot / not enough pages).
int32_t pa_alloc_seq(PagedAllocator* pa, int32_t tokens) {
  std::lock_guard<std::mutex> l(pa->mu);
  int32_t sid = -1;
  for (size_t i = 0; i < pa->seqs.size(); ++i) {
    if (!pa->seqs[i].live) { sid = static_cast<int32_t>(i); break; }
  }
  if (sid < 0) return -1;
  int32_t need = pa->pages_needed(tokens);
  if (static_cast<int32_t>(pa->free_stack.size()) < need) return -1;
  Sequence& s = pa->seqs[sid];
  s.pages.clear();
  for (int32_t i = 0; i < need; ++i) {
    int32_t p = pa->free_stack.back();
    pa->free_stack.pop_back();
    pa->refcount[p] = 1;
    s.pages.push_back(p);
  }
  s.length = tokens;
  s.live = true;
  return sid;
}

// Grow (or shrink bookkeeping of) a sequence to new_len tokens,
// allocating pages as needed. Returns 0, or -1 on OOM / bad seq.
int32_t pa_extend(PagedAllocator* pa, int32_t seq_id, int32_t new_len) {
  std::lock_guard<std::mutex> l(pa->mu);
  if (seq_id < 0 || seq_id >= static_cast<int32_t>(pa->seqs.size()))
    return -1;
  Sequence& s = pa->seqs[seq_id];
  if (!s.live) return -1;
  int32_t need = pa->pages_needed(new_len);
  int32_t have = static_cast<int32_t>(s.pages.size());
  if (need > have) {
    if (static_cast<int32_t>(pa->free_stack.size()) < need - have)
      return -1;
    for (int32_t i = have; i < need; ++i) {
      int32_t p = pa->free_stack.back();
      pa->free_stack.pop_back();
      pa->refcount[p] = 1;
      s.pages.push_back(p);
    }
  }
  s.length = new_len;
  return 0;
}

// Fork: new sequence sharing all pages of `src` (refcounted, for prefix
// sharing). The forked sequence must copy-on-write before mutating a
// shared page — pa_cow below reports whether a page needs copying.
int32_t pa_fork(PagedAllocator* pa, int32_t src_id) {
  std::lock_guard<std::mutex> l(pa->mu);
  if (src_id < 0 || src_id >= static_cast<int32_t>(pa->seqs.size()))
    return -1;
  Sequence& src = pa->seqs[src_id];
  if (!src.live) return -1;
  int32_t sid = -1;
  for (size_t i = 0; i < pa->seqs.size(); ++i) {
    if (!pa->seqs[i].live) { sid = static_cast<int32_t>(i); break; }
  }
  if (sid < 0) return -1;
  Sequence& dst = pa->seqs[sid];
  dst.pages = src.pages;
  dst.length = src.length;
  dst.live = true;
  for (int32_t p : dst.pages) pa->refcount[p]++;
  return sid;
}

// Ensure the last page of seq is exclusively owned (copy-on-write).
// Returns: -2 bad seq; -1 OOM; otherwise the (possibly new) page id of
// the last page. If a copy is required, *copied_from is set to the old
// page id so the caller can issue the device copy; else -1.
int32_t pa_cow_last_page(PagedAllocator* pa, int32_t seq_id,
                         int32_t* copied_from) {
  std::lock_guard<std::mutex> l(pa->mu);
  *copied_from = -1;
  if (seq_id < 0 || seq_id >= static_cast<int32_t>(pa->seqs.size()))
    return -2;
  Sequence& s = pa->seqs[seq_id];
  if (!s.live || s.pages.empty()) return -2;
  int32_t last = s.pages.back();
  if (pa->refcount[last] == 1) return last;
  if (pa->free_stack.empty()) return -1;
  int32_t fresh = pa->free_stack.back();
  pa->free_stack.pop_back();
  pa->refcount[fresh] = 1;
  pa->refcount[last]--;
  s.pages.back() = fresh;
  *copied_from = last;
  return fresh;
}

void pa_free_seq(PagedAllocator* pa, int32_t seq_id) {
  std::lock_guard<std::mutex> l(pa->mu);
  if (seq_id < 0 || seq_id >= static_cast<int32_t>(pa->seqs.size())) return;
  Sequence& s = pa->seqs[seq_id];
  if (!s.live) return;
  for (int32_t p : s.pages) {
    if (--pa->refcount[p] == 0) pa->free_stack.push_back(p);
  }
  s.pages.clear();
  s.length = 0;
  s.live = false;
}

int32_t pa_seq_length(PagedAllocator* pa, int32_t seq_id) {
  std::lock_guard<std::mutex> l(pa->mu);
  if (seq_id < 0 || seq_id >= static_cast<int32_t>(pa->seqs.size()))
    return -1;
  return pa->seqs[seq_id].live ? pa->seqs[seq_id].length : -1;
}

// Copy the page table of seq into out[0..max). Unused slots get fill.
// Returns number of live pages, or -1.
int32_t pa_page_table(PagedAllocator* pa, int32_t seq_id, int32_t* out,
                      int32_t max, int32_t fill) {
  std::lock_guard<std::mutex> l(pa->mu);
  if (seq_id < 0 || seq_id >= static_cast<int32_t>(pa->seqs.size()))
    return -1;
  Sequence& s = pa->seqs[seq_id];
  if (!s.live) return -1;
  int32_t n = static_cast<int32_t>(s.pages.size());
  if (n > max) return -1;
  for (int32_t i = 0; i < n; ++i) out[i] = s.pages[i];
  for (int32_t i = n; i < max; ++i) out[i] = fill;
  return n;
}

}  // extern "C"
