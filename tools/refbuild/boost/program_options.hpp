// Minimal stand-in for boost::program_options covering exactly the subset
// the reference's ViralQuasispecies.cpp uses: options_description with
// chained add_options()("name[,short]", value<T>(&target)->default_value(d),
// "desc"), variables_map::count, store(parse_command_line(...)), notify.
// Accepts --name=value, --name value, -s value. Build-only shim for golden
// output generation; not part of the framework.
#ifndef SHIM_BOOST_PROGRAM_OPTIONS_HPP
#define SHIM_BOOST_PROGRAM_OPTIONS_HPP

#include <cstdlib>
#include <iostream>
#include <map>
#include <memory>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace boost {
namespace program_options {

struct value_base {
    virtual ~value_base() {}
    virtual void parse(const std::string& text) = 0;
    virtual void apply_default() = 0;
    virtual bool has_default() const = 0;
};

template <typename T>
struct typed_value : value_base {
    T* target;
    bool has_def = false;
    T def{};

    explicit typed_value(T* t) : target(t) {}
    typed_value* default_value(const T& d) {
        has_def = true;
        def = d;
        return this;
    }
    void parse(const std::string& text) override {
        std::istringstream ss(text);
        ss >> *target;
        if (ss.fail()) throw std::runtime_error("bad option value: " + text);
    }
    void apply_default() override {
        if (has_def) *target = def;
    }
    bool has_default() const override { return has_def; }
};

template <>
inline void typed_value<std::string>::parse(const std::string& text) {
    *target = text;
}

template <>
inline void typed_value<bool>::parse(const std::string& text) {
    if (text == "true" || text == "1" || text == "on" || text == "yes") *target = true;
    else if (text == "false" || text == "0" || text == "off" || text == "no") *target = false;
    else throw std::runtime_error("bad bool value: " + text);
}

template <typename T>
typed_value<T>* value(T* target) {
    return new typed_value<T>(target);
}

struct option_info {
    std::string long_name;
    std::string short_name;
    std::shared_ptr<value_base> val;  // null for flag-style (help)
    std::string description;
};

class options_description;

class options_adder {
    options_description* desc_;

  public:
    explicit options_adder(options_description* d) : desc_(d) {}
    options_adder& operator()(const char* name, const char* description);
    template <typename T>
    options_adder& operator()(const char* name, typed_value<T>* v, const char* description);
};

class options_description {
  public:
    std::string caption;
    std::vector<option_info> options;

    explicit options_description(const std::string& cap = "") : caption(cap) {}
    options_adder add_options() { return options_adder(this); }

    const option_info* find(const std::string& name) const {
        for (const auto& o : options)
            if (o.long_name == name || o.short_name == name) return &o;
        return nullptr;
    }
};

inline options_adder& options_adder::operator()(const char* name, const char* description) {
    option_info info;
    std::string n(name);
    auto comma = n.find(',');
    info.long_name = comma == std::string::npos ? n : n.substr(0, comma);
    info.short_name = comma == std::string::npos ? "" : n.substr(comma + 1);
    info.description = description;
    desc_->options.push_back(info);
    return *this;
}

template <typename T>
inline options_adder& options_adder::operator()(const char* name, typed_value<T>* v,
                                                const char* description) {
    option_info info;
    std::string n(name);
    auto comma = n.find(',');
    info.long_name = comma == std::string::npos ? n : n.substr(0, comma);
    info.short_name = comma == std::string::npos ? "" : n.substr(comma + 1);
    info.val.reset(v);
    info.description = description;
    desc_->options.push_back(info);
    return *this;
}

inline std::ostream& operator<<(std::ostream& os, const options_description& d) {
    os << d.caption << ":\n";
    for (const auto& o : d.options) os << "  --" << o.long_name << "\t" << o.description << "\n";
    return os;
}

struct parsed_options {
    const options_description* desc;
    std::map<std::string, std::string> given;  // long name -> raw value
};

inline parsed_options parse_command_line(int argc, char* argv[], const options_description& desc) {
    parsed_options result;
    result.desc = &desc;
    for (int i = 1; i < argc; i++) {
        std::string arg = argv[i];
        std::string name, value_text;
        bool have_value = false;
        if (arg.rfind("--", 0) == 0) {
            auto eq = arg.find('=');
            if (eq != std::string::npos) {
                name = arg.substr(2, eq - 2);
                value_text = arg.substr(eq + 1);
                have_value = true;
            } else {
                name = arg.substr(2);
            }
        } else if (arg.size() > 1 && arg[0] == '-') {
            name = arg.substr(1);
        } else {
            throw std::runtime_error("unexpected positional argument: " + arg);
        }
        const option_info* opt = desc.find(name);
        if (!opt) throw std::runtime_error("unknown option: " + arg);
        if (opt->val && !have_value) {
            if (i + 1 >= argc) throw std::runtime_error("missing value for: " + arg);
            value_text = argv[++i];
            have_value = true;
        }
        result.given[opt->long_name] = value_text;
    }
    return result;
}

class variables_map {
  public:
    std::map<std::string, int> counts;
    const options_description* desc = nullptr;
    std::map<std::string, std::string> given;

    std::size_t count(const std::string& name) const {
        auto it = counts.find(name);
        return it == counts.end() ? 0 : it->second;
    }
};

inline void store(const parsed_options& parsed, variables_map& vm) {
    vm.desc = parsed.desc;
    vm.given = parsed.given;
    for (const auto& o : parsed.desc->options) {
        bool provided = parsed.given.count(o.long_name) > 0;
        if (provided || (o.val && o.val->has_default())) vm.counts[o.long_name] = 1;
    }
}

inline void notify(variables_map& vm) {
    if (!vm.desc) return;
    for (const auto& o : vm.desc->options) {
        if (!o.val) continue;
        auto it = vm.given.find(o.long_name);
        if (it != vm.given.end()) o.val->parse(it->second);
        else o.val->apply_default();
    }
}

}  // namespace program_options
}  // namespace boost

#endif
