// Minimal drop-in for the slice of boost::multi_index that the reference's
// PriorityList.h (see /root/reference/pastar/include/PriorityList.h:40-50)
// uses: a two-index container (ordered_unique by a member + ordered_non_unique
// by a member).  Exists ONLY so the reference's serial binary can be built in
// this container (no boost dev headers available) to capture golden outputs.
//
// Semantics matched to boost.multi_index docs:
//  - ordered_non_unique keeps equivalent keys in insertion order (we key the
//    secondary index by (key, monotonic-seq)).
//  - modify() re-seats the element; for an equal-key group the element lands
//    at the group's upper bound.  (Boost may keep an element in place when the
//    new key still fits between its neighbours; for equal-key groups this can
//    differ from boost's order.  Affects only tie-break expansion order, never
//    the optimal score.)
#pragma once
#include <cstdint>
#include <map>
#include <utility>

namespace boost {
namespace multi_index {

template <typename T> struct tag {};

template <class Class, typename Type, Type Class::*PtrToMember>
struct member {
    typedef Type result_type;
    const Type& operator()(const Class& c) const { return c.*PtrToMember; }
};

#ifndef BOOST_MULTI_INDEX_MEMBER
#define BOOST_MULTI_INDEX_MEMBER(Class, Type, MemberName) \
    boost::multi_index::member<Class, Type, &Class::MemberName>
#endif

template <typename TagT, typename KeyFromValue>
struct ordered_unique {
    typedef TagT tag_type;
    typedef KeyFromValue key_from_value;
};

template <typename TagT, typename KeyFromValue>
struct ordered_non_unique {
    typedef TagT tag_type;
    typedef KeyFromValue key_from_value;
};

template <typename... Indices> struct indexed_by {};

}  // namespace multi_index

template <typename Value, typename IndexedBy> class multi_index_container;

template <typename Value, typename Tag0, typename KFV0, typename Tag1, typename KFV1>
class multi_index_container<
    Value,
    multi_index::indexed_by<
        multi_index::ordered_unique<multi_index::tag<Tag0>, KFV0>,
        multi_index::ordered_non_unique<multi_index::tag<Tag1>, KFV1>>> {
  public:
    typedef typename KFV0::result_type key0_type;
    typedef typename KFV1::result_type key1_type;
    typedef std::size_t size_type;

  private:
    // Primary storage: unique key -> (value, secondary-key incl. insertion seq).
    typedef std::pair<key1_type, std::uint64_t> sec_key;
    struct Entry {
        Value value;
        sec_key sk;
    };
    typedef std::map<key0_type, Entry> primary_map;
    // Secondary index: (key1, seq) -> primary iterator (std::map iterators are stable).
    typedef std::map<sec_key, typename primary_map::iterator> secondary_map;

    primary_map m_primary;
    secondary_map m_secondary;
    std::uint64_t m_seq = 0;

  public:
    class iterator {
      public:
        typename primary_map::iterator it;
        iterator() {}
        explicit iterator(typename primary_map::iterator i) : it(i) {}
        const Value& operator*() const { return it->second.value; }
        const Value* operator->() const { return &it->second.value; }
        bool operator==(const iterator& o) const { return it == o.it; }
        bool operator!=(const iterator& o) const { return it != o.it; }
    };

    iterator find(const key0_type& k) const {
        return iterator(const_cast<primary_map&>(m_primary).find(k));
    }
    iterator end() const {
        return iterator(const_cast<primary_map&>(m_primary).end());
    }
    size_type size() const { return m_primary.size(); }
    bool empty() const { return m_primary.empty(); }

    std::pair<iterator, bool> insert(const Value& v) {
        key0_type k0 = KFV0()(v);
        typename primary_map::iterator pit = m_primary.find(k0);
        if (pit != m_primary.end()) return std::make_pair(iterator(pit), false);
        sec_key sk(KFV1()(v), ++m_seq);
        pit = m_primary.emplace(k0, Entry{v, sk}).first;
        m_secondary.emplace(sk, pit);
        return std::make_pair(iterator(pit), true);
    }

    size_type erase(const key0_type& k) {
        typename primary_map::iterator pit = m_primary.find(k);
        if (pit == m_primary.end()) return 0;
        m_secondary.erase(pit->second.sk);
        m_primary.erase(pit);
        return 1;
    }

    template <typename Modifier>
    bool modify(iterator pos, Modifier mod) {
        Entry& e = pos.it->second;
        mod(e.value);
        key1_type nk1 = KFV1()(e.value);
        if (!(nk1 == e.sk.first)) {
            m_secondary.erase(e.sk);
            e.sk = sec_key(nk1, ++m_seq);
            m_secondary.emplace(e.sk, pos.it);
        }
        return true;
    }

    // ---- secondary (priority) view -------------------------------------
    class sec_iterator {
      public:
        typename secondary_map::iterator it;
        sec_iterator() {}
        explicit sec_iterator(typename secondary_map::iterator i) : it(i) {}
        const Value& operator*() const { return it->second->second.value; }
        const Value* operator->() const { return &it->second->second.value; }
        bool operator==(const sec_iterator& o) const { return it == o.it; }
        bool operator!=(const sec_iterator& o) const { return it != o.it; }
        sec_iterator& operator++() { ++it; return *this; }
    };

    class secondary_view {
        multi_index_container* c;
      public:
        explicit secondary_view(multi_index_container* cc) : c(cc) {}
        sec_iterator begin() const {
            return sec_iterator(c->m_secondary.begin());
        }
        sec_iterator end() const { return sec_iterator(c->m_secondary.end()); }
        void erase(sec_iterator pos) {
            typename primary_map::iterator pit = pos.it->second;
            c->m_secondary.erase(pos.it);
            c->m_primary.erase(pit);
        }
    };

    secondary_view get_secondary() const {
        return secondary_view(const_cast<multi_index_container*>(this));
    }
};

namespace multi_index {
// get<Tag>(container): PriorityList only ever asks for the priority (second,
// ordered_non_unique) index, so that is all we provide.
template <typename Tag, typename MIC>
auto get(MIC& c) -> decltype(c.get_secondary()) {
    return c.get_secondary();
}
template <typename Tag, typename MIC>
auto get(const MIC& c) -> decltype(c.get_secondary()) {
    return c.get_secondary();
}
}  // namespace multi_index

using multi_index::get;

}  // namespace boost
