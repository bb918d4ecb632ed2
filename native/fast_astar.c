/*
 * fast_astar.c — native serial A* engine over the N-dimensional edit lattice.
 *
 * Host-side native runtime of the TPU framework: the performance-grade serial
 * oracle (the role the reference's AStar.cpp + PriorityList.h play,
 * ref: pastar/AStar.cpp:53-104) built as a C library loaded via ctypes.
 * Open-addressed hash map + lazy-deletion binary heap instead of the
 * reference's boost multi_index / std::map; identical search semantics:
 * decrease-key upserts, closed-reopen on better g, stop when the goal is
 * dequeued.
 *
 * Build: gcc -O3 -march=native -shared -fPIC fast_astar.c -o libfastastar.so
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define MAX_N 16
#define MAX_W 8
#define STATE_EMPTY 0
#define STATE_OPEN 1
#define STATE_CLOSED 2

typedef struct {
    uint32_t key[MAX_W]; /* packed coords, 2 per word */
    int32_t g;
    int32_t f;  /* current best f while open */
    int32_t h;  /* cached heuristic (coord-invariant) */
    int32_t parenti;
    uint8_t state;
} Entry;

typedef struct {
    int32_t f;
    uint32_t idx; /* entry index in arena */
} HeapItem;

typedef struct {
    Entry *arena;
    uint32_t arena_len, arena_cap;
    uint32_t *slots; /* slot -> arena idx + 1; 0 = empty */
    uint32_t cap;    /* power of two */
    uint32_t mask;
    uint32_t used;
} Map;

typedef struct {
    HeapItem *items;
    uint32_t len, cap;
} Heap;

static uint32_t hash_key(const uint32_t *key, int W)
{
    uint32_t h = 2166136261u;
    for (int w = 0; w < W; w++) {
        h = (h ^ key[w]) * 16777619u;
    }
    h ^= h >> 16; h *= 0x85EBCA6Bu;
    h ^= h >> 13; h *= 0xC2B2AE35u;
    h ^= h >> 16;
    return h;
}

static int map_init(Map *m, uint32_t cap)
{
    m->cap = cap;
    m->mask = cap - 1;
    m->used = 0;
    m->slots = calloc(cap, sizeof(uint32_t));
    m->arena_cap = cap / 2;
    m->arena_len = 0;
    m->arena = malloc((size_t)m->arena_cap * sizeof(Entry));
    return m->slots && m->arena ? 0 : -1;
}

static void map_free(Map *m)
{
    free(m->slots);
    free(m->arena);
}

static int map_grow(Map *m, int W);

/* find or create the entry for key; *created set accordingly */
static Entry *map_upsert(Map *m, const uint32_t *key, int W, int *created)
{
    if ((m->used + 1) * 10 > m->cap * 7) { /* 70% load -> grow */
        if (map_grow(m, W)) return NULL;
    }
    uint32_t h = hash_key(key, W);
    for (uint32_t r = 0;; r++) {
        uint32_t slot = (h + (r * (r + 1)) / 2) & m->mask;
        uint32_t v = m->slots[slot];
        if (v == 0) {
            if (m->arena_len == m->arena_cap) {
                m->arena_cap *= 2;
                Entry *na = realloc(m->arena, (size_t)m->arena_cap * sizeof(Entry));
                if (!na) return NULL;
                m->arena = na;
            }
            Entry *e = &m->arena[m->arena_len];
            memcpy(e->key, key, (size_t)W * sizeof(uint32_t));
            e->state = STATE_EMPTY;
            m->slots[slot] = ++m->arena_len;
            m->used++;
            *created = 1;
            return e;
        }
        Entry *e = &m->arena[v - 1];
        if (!memcmp(e->key, key, (size_t)W * sizeof(uint32_t))) {
            *created = 0;
            return e;
        }
    }
}

static Entry *map_find(Map *m, const uint32_t *key, int W)
{
    uint32_t h = hash_key(key, W);
    for (uint32_t r = 0;; r++) {
        uint32_t slot = (h + (r * (r + 1)) / 2) & m->mask;
        uint32_t v = m->slots[slot];
        if (v == 0) return NULL;
        Entry *e = &m->arena[v - 1];
        if (!memcmp(e->key, key, (size_t)W * sizeof(uint32_t))) return e;
    }
}

static int map_grow(Map *m, int W)
{
    uint32_t ncap = m->cap * 2;
    uint32_t *nslots = calloc(ncap, sizeof(uint32_t));
    if (!nslots) return -1;
    uint32_t nmask = ncap - 1;
    for (uint32_t i = 0; i < m->arena_len; i++) {
        uint32_t h = hash_key(m->arena[i].key, W);
        for (uint32_t r = 0;; r++) {
            uint32_t slot = (h + (r * (r + 1)) / 2) & nmask;
            if (nslots[slot] == 0) {
                nslots[slot] = i + 1;
                break;
            }
        }
    }
    free(m->slots);
    m->slots = nslots;
    m->cap = ncap;
    m->mask = nmask;
    return 0;
}

static int heap_push(Heap *hp, int32_t f, uint32_t idx)
{
    if (hp->len == hp->cap) {
        hp->cap *= 2;
        HeapItem *ni = realloc(hp->items, (size_t)hp->cap * sizeof(HeapItem));
        if (!ni) return -1;
        hp->items = ni;
    }
    uint32_t i = hp->len++;
    while (i > 0) {
        uint32_t p = (i - 1) / 2;
        if (hp->items[p].f <= f) break;
        hp->items[i] = hp->items[p];
        i = p;
    }
    hp->items[i].f = f;
    hp->items[i].idx = idx;
    return 0;
}

static int heap_pop(Heap *hp, HeapItem *out)
{
    if (hp->len == 0) return -1;
    *out = hp->items[0];
    HeapItem last = hp->items[--hp->len];
    uint32_t i = 0;
    for (;;) {
        uint32_t c = 2 * i + 1;
        if (c >= hp->len) break;
        if (c + 1 < hp->len && hp->items[c + 1].f < hp->items[c].f) c++;
        if (hp->items[c].f >= last.f) break;
        hp->items[i] = hp->items[c];
        i = c;
    }
    hp->items[i] = last;
    return 0;
}

static void pack_key(const uint16_t *coord, int n, int W, uint32_t *key)
{
    for (int w = 0; w < W; w++) key[w] = 0;
    for (int i = 0; i < n; i++) key[i / 2] |= (uint32_t)coord[i] << (16 * (i % 2));
}

/*
 * Main search. Returns 0 on success, negative on error.
 * out_masks must have room for sum(final_coord) int32s.
 */
int64_t astar_search(
    int n, int n_pairs, int W,
    const uint16_t *final_coord,
    const uint8_t *seqs, int enc_stride,
    const int32_t *cost_table, /* 128*128 */
    const int32_t *pair_x, const int32_t *pair_y, const int32_t *pair_w,
    const int32_t *tables, int S, /* n_pairs * S * S suffix tables */
    int gap_open, int gap_ext, int gap_gap,
    int root_parenti,
    uint32_t init_cap,
    int32_t *out_g, int32_t *out_h,
    int32_t *out_masks, int32_t *out_masks_len,
    int64_t *out_stats /* expanded, reopened, open_len, closed */)
{
    int M = (1 << n) - 1;
    Map map;
    Heap heap;
    if (map_init(&map, init_cap)) return -1;
    heap.cap = 1 << 16;
    heap.len = 0;
    heap.items = malloc((size_t)heap.cap * sizeof(HeapItem));
    if (!heap.items) { map_free(&map); return -1; }

    int64_t expanded = 0, reopened = 0;

    /* per-mask precomputed data: which pairs advance both; constant part */
    /* constant part assumes gap_open == gap_ext (checked by caller);     */
    /* general parenti-dependent case handled in the slow branch.         */
    int both_cnt[1 << MAX_N];
    int32_t *both_pairs = malloc((size_t)(M + 1) * n_pairs * sizeof(int32_t));
    int32_t const_part[1 << MAX_N];
    int generic_gaps = (gap_open != gap_ext);
    if (!both_pairs) { free(heap.items); map_free(&map); return -1; }
    for (int m = 1; m <= M; m++) {
        int cnt = 0;
        int32_t cst = 0;
        for (int p = 0; p < n_pairs; p++) {
            int bx = (m >> pair_x[p]) & 1;
            int by = (m >> pair_y[p]) & 1;
            if (bx && by) {
                both_pairs[m * n_pairs + cnt++] = p;
            } else if (!bx && !by) {
                cst += gap_gap * pair_w[p];
            } else {
                cst += gap_ext * pair_w[p]; /* exact when open==ext */
            }
        }
        both_cnt[m] = cnt;
        const_part[m] = cst;
    }

    /* heuristic of a coord */
#define CALC_H(coord, hval)                                                   \
    do {                                                                      \
        int64_t acc = 0;                                                      \
        for (int p = 0; p < n_pairs; p++)                                     \
            acc += (int64_t)pair_w[p] *                                       \
                   tables[(size_t)p * S * S + (size_t)(coord)[pair_x[p]] * S + \
                          (coord)[pair_y[p]]];                                \
        (hval) = (int32_t)acc;                                                \
    } while (0)

    /* root */
    uint16_t root[MAX_N];
    for (int i = 0; i < n; i++) root[i] = 0;
    uint32_t rkey[MAX_W];
    pack_key(root, n, W, rkey);
    int created;
    Entry *re = map_upsert(&map, rkey, W, &created);
    if (!re) goto oom;
    re->g = 0;
    CALC_H(root, re->h);
    re->f = re->h;
    re->parenti = root_parenti;
    re->state = STATE_OPEN;
    if (heap_push(&heap, re->f, (uint32_t)(re - map.arena))) goto oom;

    uint32_t goal_key[MAX_W];
    pack_key(final_coord, n, W, goal_key);

    int32_t mm[MAX_N * MAX_N];
    uint16_t cur[MAX_N], child[MAX_N];

    for (;;) {
        HeapItem top;
        if (heap_pop(&heap, &top)) { /* open exhausted */
            free(both_pairs); free(heap.items); map_free(&map);
            return -2;
        }
        Entry *e = &map.arena[top.idx];
        if (e->state != STATE_OPEN || e->f != top.f) continue; /* stale */
        e->state = STATE_CLOSED;
        expanded++;

        if (!memcmp(e->key, goal_key, (size_t)W * sizeof(uint32_t))) {
            *out_g = e->g;
            *out_h = e->h;
            /* backtrace: walk parenti chain */
            int32_t len = 0;
            uint32_t ck[MAX_W];
            memcpy(ck, goal_key, sizeof(ck));
            uint16_t c[MAX_N];
            for (int i = 0; i < n; i++) c[i] = final_coord[i];
            for (;;) {
                int at_origin = 1;
                for (int i = 0; i < n; i++) if (c[i]) { at_origin = 0; break; }
                if (at_origin) break;
                Entry *pe = map_find(&map, ck, W);
                if (!pe) { free(both_pairs); free(heap.items); map_free(&map); return -3; }
                int32_t pm = pe->parenti;
                out_masks[len++] = pm;
                for (int i = 0; i < n; i++) c[i] -= (uint16_t)((pm >> i) & 1);
                pack_key(c, n, W, ck);
            }
            *out_masks_len = len;
            out_stats[0] = expanded;
            out_stats[1] = reopened;
            out_stats[2] = (int64_t)heap.len;
            out_stats[3] = (int64_t)map.used;
            free(both_pairs); free(heap.items); map_free(&map);
            return 0;
        }

        /* unpack coord */
        for (int i = 0; i < n; i++)
            cur[i] = (uint16_t)((e->key[i / 2] >> (16 * (i % 2))) & 0xFFFF);
        int32_t g0 = e->g;
        int32_t parenti = e->parenti;

        /* per-pair substitution costs at the current position */
        for (int p = 0; p < n_pairs; p++) {
            uint8_t a = seqs[(size_t)pair_x[p] * enc_stride + cur[pair_x[p]]];
            uint8_t b = seqs[(size_t)pair_y[p] * enc_stride + cur[pair_y[p]]];
            mm[p] = cost_table[(size_t)a * 128 + b];
        }

        for (int m = 1; m <= M; m++) {
            int ok = 1;
            for (int i = 0; i < n; i++) {
                child[i] = cur[i] + (uint16_t)((m >> i) & 1);
                if (child[i] > final_coord[i]) { ok = 0; break; }
            }
            if (!ok) continue;
            int32_t cost = const_part[m];
            const int32_t *bp = &both_pairs[m * n_pairs];
            for (int k = 0; k < both_cnt[m]; k++) {
                int p = bp[k];
                cost += mm[p] * pair_w[p];
            }
            if (generic_gaps) {
                /* recompute single-advance pairs with open/ext distinction */
                cost = 0;
                for (int p = 0; p < n_pairs; p++) {
                    int bx = (m >> pair_x[p]) & 1;
                    int by = (m >> pair_y[p]) & 1;
                    int32_t pc;
                    if (bx && by) pc = mm[p];
                    else if (!bx && !by) pc = gap_gap;
                    else {
                        int s = bx ? pair_y[p] : pair_x[p];
                        pc = (((parenti >> s) & 1) != ((m >> s) & 1)) ? gap_open : gap_ext;
                    }
                    cost += pc * pair_w[p];
                }
            }
            int32_t cg = g0 + cost;

            uint32_t ckey[MAX_W];
            pack_key(child, n, W, ckey);
            Entry *ce = map_upsert(&map, ckey, W, &created);
            if (!ce) goto oom;
            /* map_grow may have moved the arena: refresh e is unnecessary
               (we copied what we need into locals) */
            if (created) {
                ce->g = cg;
                CALC_H(child, ce->h);
                ce->f = cg + ce->h;
                ce->parenti = m;
                ce->state = STATE_OPEN;
                if (heap_push(&heap, ce->f, (uint32_t)(ce - map.arena))) goto oom;
            } else if (ce->state == STATE_CLOSED) {
                if (cg < ce->g) { /* reopen */
                    ce->g = cg;
                    ce->f = cg + ce->h;
                    ce->parenti = m;
                    ce->state = STATE_OPEN;
                    reopened++;
                    if (heap_push(&heap, ce->f, (uint32_t)(ce - map.arena))) goto oom;
                }
            } else { /* open: conditional decrease-key */
                int32_t cf = cg + ce->h;
                if (cf < ce->f) {
                    ce->g = cg;
                    ce->f = cf;
                    ce->parenti = m;
                    if (heap_push(&heap, cf, (uint32_t)(ce - map.arena))) goto oom;
                }
            }
        }
    }

oom:
    free(both_pairs);
    free(heap.items);
    map_free(&map);
    return -1;
}
