// btllib-compat shim: KmerBloomFilter over the framework's .bf file format.
//
// Call surface used by /root/reference/ntedit.cpp (BFWrapper, lines
// 350-401): BloomFilter::check_file_signature, KmerBloomFilter(path),
// contains(const uint64_t*), get_k, get_hash_num, get_bytes, get_fpr.
// File format + probe semantics are the framework's canonical ones
// (ntedit_tpu/core/bloom.py: signature line, `key = value` metadata,
// [HEADER_END], raw bit array; bit index = hash % (bytes*8), little-endian
// bit order within bytes) so the reference binary and the framework probe
// the SAME artifact identically.
#ifndef BTLLIB_BLOOM_FILTER_HPP
#define BTLLIB_BLOOM_FILTER_HPP

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <fstream>
#include <iostream>
#include <map>
#include <string>
#include <vector>

namespace btllib {

static const char* const KMER_BLOOM_FILTER_SIGNATURE = "[BTLKmerBloomFilter_v6]";

namespace shim_internals {

struct FilterFile
{
	std::string signature;
	std::map<std::string, std::string> meta;
	std::vector<uint8_t> data;
};

inline FilterFile
load_filter_file(const std::string& path)
{
	FilterFile f;
	std::ifstream in(path, std::ios::binary);
	if (!in) {
		std::cerr << "btllib shim: cannot open " << path << std::endl;
		std::exit(EXIT_FAILURE);
	}
	std::getline(in, f.signature);
	std::string line;
	while (std::getline(in, line)) {
		if (line == "[HEADER_END]")
			break;
		auto eq = line.find('=');
		if (eq == std::string::npos)
			continue;
		auto strip = [](std::string s) {
			size_t a = s.find_first_not_of(" \t");
			size_t b = s.find_last_not_of(" \t\r\"");
			return a == std::string::npos ? std::string() : s.substr(a, b - a + 1);
		};
		f.meta[strip(line.substr(0, eq))] = strip(line.substr(eq + 1));
	}
	f.data.assign(std::istreambuf_iterator<char>(in), std::istreambuf_iterator<char>());
	auto it = f.meta.find("bytes");
	if (it != f.meta.end()) {
		size_t n = (size_t)std::stoull(it->second);
		if (f.data.size() < n) {
			std::cerr << "btllib shim: truncated filter " << path << std::endl;
			std::exit(EXIT_FAILURE);
		}
		f.data.resize(n);
	}
	return f;
}

inline unsigned
meta_uint(const FilterFile& f, const char* key, unsigned dflt)
{
	auto it = f.meta.find(key);
	return it == f.meta.end() ? dflt : (unsigned)std::stoul(it->second);
}

} // namespace shim_internals

class BloomFilter
{
  public:
	static bool check_file_signature(const std::string& path, const std::string& signature)
	{
		std::ifstream in(path, std::ios::binary);
		if (!in)
			return false;
		std::string first;
		std::getline(in, first);
		while (!first.empty() && (first.back() == '\r' || first.back() == '\n'))
			first.pop_back();
		return first == signature;
	}
};

class KmerBloomFilter
{
  public:
	explicit KmerBloomFilter(const std::string& path)
	{
		auto f = shim_internals::load_filter_file(path);
		if (f.signature != KMER_BLOOM_FILTER_SIGNATURE) {
			std::cerr << "btllib shim: " << path << " is not a k-mer Bloom filter ("
			          << f.signature << ")" << std::endl;
			std::exit(EXIT_FAILURE);
		}
		data_ = std::move(f.data);
		hash_num_ = shim_internals::meta_uint(f, "hash_num", 3);
		k_ = shim_internals::meta_uint(f, "k", 0);
	}

	bool contains(const uint64_t* hashes) const
	{
		const uint64_t bits = (uint64_t)data_.size() * 8;
		for (unsigned i = 0; i < hash_num_; ++i) {
			uint64_t idx = hashes[i] % bits;
			if (!((data_[idx >> 3] >> (idx & 7)) & 1))
				return false;
		}
		return true;
	}

	unsigned get_k() const { return k_; }
	unsigned get_hash_num() const { return hash_num_; }
	uint64_t get_bytes() const { return data_.size(); }

	double get_fpr() const
	{
		uint64_t pop = 0;
		for (uint8_t b : data_)
			pop += __builtin_popcount(b);
		return std::pow((double)pop / ((double)data_.size() * 8), (double)hash_num_);
	}

  private:
	std::vector<uint8_t> data_;
	unsigned hash_num_ = 3;
	unsigned k_ = 0;
};

} // namespace btllib

#endif
