# goawk custom-function emulation prelude (POSIX awk / mawk).
# Reads come from BEGIN-seeded arrays (__J/__T/__L json paths, __M metadata);
# writes are emitted as sentinel control lines on STDERR (stdout stays the
# user's — a control line after an unterminated printf would otherwise glue
# onto it, and payload echoes could forge ops): \035G\036 op \037 field
# \037 field, with \, newline and the \037 field separator escaped.

function __esc(s) {
  gsub(/\\/, "\\\\\\\\", s); gsub(/\n/, "\\\\n", s)
  gsub(__US, "\\\\U", s)
  return s
}
function __ctl(s) { printf "%s%s\n", "\035G\036", s > "/dev/stderr" }
function __fail(m) { __ctl("err\037" __esc(m)); exit 0 }

function __jesc(s) {
  gsub(/\\/, "\\\\\\\\", s); gsub(/"/, "\\\\\"", s)
  gsub(/\n/, "\\\\n", s); gsub(/\r/, "\\\\r", s); gsub(/\t/, "\\\\t", s)
  return "\"" s "\""
}

function __jok() { if (!__JSON_OK) __fail("failed to parse message into json: invalid character") }

function json_get(p) { __jok(); return (p in __J) ? __J[p] : "null" }

function __set(p, v, t) {
  __jok()
  __J[p] = v; __T[p] = t; __L[p] = (t == "string") ? length(v) : 0
  __ctl("js\037" t "\037" __esc(p) "\037" __esc(v))
  return 0
}
function json_set(p, v) { return __set(p, "" v, "string") }
function json_set_int(p, v) { return __set(p, sprintf("%d", v), "int") }
function json_set_float(p, v) { return __set(p, sprintf("%.15g", v), "float") }
function json_set_bool(p, v) { return __set(p, (v ? "true" : "false"), "bool") }

function __app(p, v, t,   enc, old) {
  __jok()
  enc = (t == "string") ? __jesc(v) : v
  if (p in __T) {
    if (__T[p] == "array") {
      __J[p] = (__L[p] == 0) ? "[" enc "]" : substr(__J[p], 1, length(__J[p]) - 1) "," enc "]"
      __L[p]++
    } else {
      old = (__T[p] == "string") ? __jesc(__J[p]) : __J[p]
      __J[p] = "[" old "," enc "]"
      __T[p] = "array"; __L[p] = 2
    }
  } else { __J[p] = "[" enc "]"; __T[p] = "array"; __L[p] = 1 }
  __ctl("ja\037" t "\037" __esc(p) "\037" __esc(v))
  return 0
}
function json_append(p, v) { return __app(p, "" v, "string") }
function json_append_int(p, v) { return __app(p, sprintf("%d", v), "int") }
function json_append_float(p, v) { return __app(p, sprintf("%.15g", v), "float") }
function json_append_bool(p, v) { return __app(p, (v ? "true" : "false"), "bool") }

function json_delete(p,   k, n, i, dead) {
  __jok()
  n = 0
  for (k in __J) if (k == p || index(k, p ".") == 1) dead[++n] = k
  for (i = 1; i <= n; i++) { delete __J[dead[i]]; delete __T[dead[i]]; delete __L[dead[i]] }
  __ctl("jd\037" __esc(p))
  return 0
}
function json_length(p) { __jok(); return (p in __L) ? __L[p] : 0 }
function json_type(p) { __jok(); return (p in __T) ? __T[p] : "undefined" }

function metadata_get(k) { return (k in __M) ? __M[k] : "" }
function metadata_set(k, v) { v = "" v; __M[k] = v; __ctl("ms\037" __esc(k) "\037" __esc(v)) }
function print_log(m, lvl) { __ctl("log\037" __esc("" lvl) "\037" __esc("" m)) }

function create_json_object(k1,v1,k2,v2,k3,v3,k4,v4,k5,v5,k6,v6,k7,v7,k8,v8,   K,V,n,i,j,tk,tv,out) {
  n = 0
  if (k1 != "" || ("" v1) != "") { K[++n] = "" k1; V[n] = "" v1 }
  if (n == 1 && (k2 != "" || ("" v2) != "")) { K[++n] = "" k2; V[n] = "" v2 }
  if (n == 2 && (k3 != "" || ("" v3) != "")) { K[++n] = "" k3; V[n] = "" v3 }
  if (n == 3 && (k4 != "" || ("" v4) != "")) { K[++n] = "" k4; V[n] = "" v4 }
  if (n == 4 && (k5 != "" || ("" v5) != "")) { K[++n] = "" k5; V[n] = "" v5 }
  if (n == 5 && (k6 != "" || ("" v6) != "")) { K[++n] = "" k6; V[n] = "" v6 }
  if (n == 6 && (k7 != "" || ("" v7) != "")) { K[++n] = "" k7; V[n] = "" v7 }
  if (n == 7 && (k8 != "" || ("" v8) != "")) { K[++n] = "" k8; V[n] = "" v8 }
  for (i = 2; i <= n; i++) {
    tk = K[i]; tv = V[i]; j = i - 1
    while (j >= 1 && K[j] > tk) { K[j+1] = K[j]; V[j+1] = V[j]; j-- }
    K[j+1] = tk; V[j+1] = tv
  }
  out = "{"
  for (i = 1; i <= n; i++) out = out (i > 1 ? "," : "") __jesc(K[i]) ":" __jesc(V[i])
  return out "}"
}
function create_json_array(v1,v2,v3,v4,v5,v6,v7,v8,v9,v10,v11,v12,   A,n,i,out) {
  n = 0
  if (("" v1) != "") { A[++n] = "" v1 }
  if (n == 1 && ("" v2) != "") { A[++n] = "" v2 }
  if (n == 2 && ("" v3) != "") { A[++n] = "" v3 }
  if (n == 3 && ("" v4) != "") { A[++n] = "" v4 }
  if (n == 4 && ("" v5) != "") { A[++n] = "" v5 }
  if (n == 5 && ("" v6) != "") { A[++n] = "" v6 }
  if (n == 6 && ("" v7) != "") { A[++n] = "" v7 }
  if (n == 7 && ("" v8) != "") { A[++n] = "" v8 }
  if (n == 8 && ("" v9) != "") { A[++n] = "" v9 }
  if (n == 9 && ("" v10) != "") { A[++n] = "" v10 }
  if (n == 10 && ("" v11) != "") { A[++n] = "" v11 }
  if (n == 11 && ("" v12) != "") { A[++n] = "" v12 }
  out = "["
  for (i = 1; i <= n; i++) out = out (i > 1 ? "," : "") __jesc(A[i])
  return out "]"
}

# ---- timestamps (Go layout tokens; Howard Hinnant civil-date algorithms) ----

function __days_from_civil(y, m, d,   era, yoe, doy, doe) {
  if (m <= 2) y--
  era = int(((y >= 0) ? y : y - 399) / 400)
  yoe = y - era * 400
  doy = int((153 * (m + ((m > 2) ? -3 : 9)) + 2) / 5) + d - 1
  doe = yoe * 365 + int(yoe / 4) - int(yoe / 100) + doy
  return era * 146097 + doe - 719468
}
function __civil_from_days(z,   era, doe, yoe, doy, mp) {
  z += 719468
  era = int(((z >= 0) ? z : z - 146096) / 146097)
  doe = z - era * 146097
  yoe = int((doe - int(doe / 1460) + int(doe / 36524) - int(doe / 146096)) / 365)
  __CY = yoe + era * 400
  doy = doe - (365 * yoe + int(yoe / 4) - int(yoe / 100))
  mp = int((5 * doy + 2) / 153)
  __CD = doy - int((153 * mp + 2) / 5) + 1
  __CM = mp + ((mp < 10) ? 3 : -9)
  if (__CM <= 2) __CY++
}

function __2d(s, pos) { return substr(s, pos, 2) ~ /^[0-9][0-9]$/ ? substr(s, pos, 2) + 0 : -1 }

# Parse input s against Go layout; returns unix seconds, or sets __TS_ERR=1.
# Fractional seconds (".000..." tokens) land in __TS_FRAC as a 0-padded
# 9-digit string. Unknown zone names parse with offset 0, matching Go's
# fabricated-zone behavior for non-local abbreviations.
function __ts_parse(s, layout,   li, si, ll, sl, c, Y, Mo, D, H, Mi, Se, pm12, ispm, off, w, k, n, neg) {
  __TS_ERR = 0; __TS_FRAC = "000000000"
  Y = 1; Mo = 1; D = 1; H = 0; Mi = 0; Se = 0; pm12 = 0; ispm = 0; off = 0
  li = 1; si = 1; ll = length(layout); sl = length(s)
  while (li <= ll) {
    if (substr(layout, li, 4) == "2006") {
      w = substr(s, si, 4)
      if (w !~ /^[0-9][0-9][0-9][0-9]$/) { __TS_ERR = 1; return 0 }
      Y = w + 0; li += 4; si += 4
    } else if (substr(layout, li, 10) == ".000000000" || substr(layout, li, 7) == ".000000" || substr(layout, li, 4) == ".000") {
      if (substr(layout, li, 10) == ".000000000") n = 9
      else if (substr(layout, li, 7) == ".000000") n = 6
      else n = 3
      if (substr(s, si, 1) != ".") { __TS_ERR = 1; return 0 }
      w = substr(s, si + 1, n)
      if (w !~ /^[0-9]+$/ || length(w) != n) { __TS_ERR = 1; return 0 }
      __TS_FRAC = substr(w "00000000", 1, 9)
      li += n + 1; si += n + 1
    } else if (substr(layout, li, 3) == "Jan") {
      w = substr(s, si, 3)
      if (!(w in __MON3)) { __TS_ERR = 1; return 0 }
      Mo = __MON3[w]; li += 3; si += 3
    } else if (substr(layout, li, 3) == "Mon") {
      w = substr(s, si, 3)
      if (!(w in __DOW3)) { __TS_ERR = 1; return 0 }
      li += 3; si += 3
    } else if (substr(layout, li, 3) == "MST") {
      n = 0
      while (n < 5 && substr(s, si + n, 1) ~ /^[A-Z]$/) n++
      if (n == 0) { __TS_ERR = 1; return 0 }
      li += 3; si += n
    } else if (substr(layout, li, 6) == "Z07:00" || substr(layout, li, 6) == "-07:00") {
      c = substr(s, si, 1)
      if (substr(layout, li, 1) == "Z" && c == "Z") { si += 1 }
      else if (c == "+" || c == "-") {
        neg = (c == "-") ? -1 : 1
        k = __2d(s, si + 1); n = __2d(s, si + 4)
        if (k < 0 || n < 0 || substr(s, si + 3, 1) != ":") { __TS_ERR = 1; return 0 }
        off = neg * (k * 3600 + n * 60); si += 6
      } else { __TS_ERR = 1; return 0 }
      li += 6
    } else if (substr(layout, li, 5) == "Z0700" || substr(layout, li, 5) == "-0700") {
      c = substr(s, si, 1)
      if (substr(layout, li, 1) == "Z" && c == "Z") { si += 1 }
      else if (c == "+" || c == "-") {
        neg = (c == "-") ? -1 : 1
        k = __2d(s, si + 1); n = __2d(s, si + 3)
        if (k < 0 || n < 0) { __TS_ERR = 1; return 0 }
        off = neg * (k * 3600 + n * 60); si += 5
      } else { __TS_ERR = 1; return 0 }
      li += 5
    } else if (substr(layout, li, 2) == "01") {
      Mo = __2d(s, si); if (Mo < 0) { __TS_ERR = 1; return 0 }
      li += 2; si += 2
    } else if (substr(layout, li, 2) == "02") {
      D = __2d(s, si); if (D < 0) { __TS_ERR = 1; return 0 }
      li += 2; si += 2
    } else if (substr(layout, li, 2) == "03") {
      pm12 = 1; H = __2d(s, si); if (H < 0) { __TS_ERR = 1; return 0 }
      li += 2; si += 2
    } else if (substr(layout, li, 2) == "04") {
      Mi = __2d(s, si); if (Mi < 0) { __TS_ERR = 1; return 0 }
      li += 2; si += 2
    } else if (substr(layout, li, 2) == "05") {
      Se = __2d(s, si); if (Se < 0) { __TS_ERR = 1; return 0 }
      li += 2; si += 2
    } else if (substr(layout, li, 2) == "06") {
      w = substr(s, si, 2)
      if (w !~ /^[0-9][0-9]$/) { __TS_ERR = 1; return 0 }
      Y = w + 0; Y += (Y >= 69) ? 1900 : 2000
      li += 2; si += 2
    } else if (substr(layout, li, 2) == "15") {
      H = __2d(s, si); if (H < 0) { __TS_ERR = 1; return 0 }
      li += 2; si += 2
    } else if (substr(layout, li, 2) == "PM" || substr(layout, li, 2) == "pm") {
      w = substr(s, si, 2)
      if (substr(layout, li, 1) == "p") { if (w != "am" && w != "pm") { __TS_ERR = 1; return 0 }; ispm = (w == "pm") }
      else { if (w != "AM" && w != "PM") { __TS_ERR = 1; return 0 }; ispm = (w == "PM") }
      li += 2; si += 2
    } else if (substr(layout, li, 1) == "1" || substr(layout, li, 1) == "2" || substr(layout, li, 1) == "3") {
      c = substr(layout, li, 1)
      if (substr(s, si, 1) !~ /^[0-9]$/) { __TS_ERR = 1; return 0 }
      if (substr(s, si + 1, 1) ~ /^[0-9]$/) { w = substr(s, si, 2) + 0; si += 2 } else { w = substr(s, si, 1) + 0; si += 1 }
      if (c == "1") Mo = w
      else if (c == "2") D = w
      else { H = w; pm12 = 1 }
      li += 1
    } else {
      if (substr(s, si, 1) != substr(layout, li, 1)) { __TS_ERR = 1; return 0 }
      li += 1; si += 1
    }
  }
  if (si != sl + 1) { __TS_ERR = 1; return 0 }
  if (Mo < 1 || Mo > 12 || D < 1 || D > 31 || H > 23 || Mi > 59 || Se > 60) { __TS_ERR = 1; return 0 }
  if (pm12) { H = H % 12; if (ispm) H += 12 }
  return __days_from_civil(Y, Mo, D) * 86400 + H * 3600 + Mi * 60 + Se - off
}

function __ts_try(s,   u) {
  u = __ts_parse(s, "Mon Jan 02 15:04:05 -0700 2006"); if (!__TS_ERR) return u
  u = __ts_parse(s, "Mon, 02 Jan 2006 15:04:05 -0700"); if (!__TS_ERR) return u
  u = __ts_parse(s, "Mon, 02 Jan 2006 15:04:05 MST"); if (!__TS_ERR) return u
  u = __ts_parse(s, "2006-01-02T15:04:05Z07:00"); if (!__TS_ERR) return u
  u = __ts_parse(s, "02 Jan 06 15:04 MST"); if (!__TS_ERR) return u
  u = __ts_parse(s, "02 Jan 06 15:04 -0700"); if (!__TS_ERR) return u
  u = __ts_parse(s, "Mon, 2 Jan 2006 15:04:05 -0700"); if (!__TS_ERR) return u
  u = __ts_parse(s, "2006-01-02T15:04:05MST"); if (!__TS_ERR) return u
  u = __ts_parse(s, "2006-01-02T15:04:05"); if (!__TS_ERR) return u
  u = __ts_parse(s, "2006-01-02 15:04:05"); if (!__TS_ERR) return u
  u = __ts_parse(s, "2006-01-02T15:04:05Z0700"); if (!__TS_ERR) return u
  u = __ts_parse(s, "2006-01-02"); if (!__TS_ERR) return u
  __fail("failed to detect datetime format of: " s)
}

function timestamp_unix(s, fmt,   u) {
  s = "" s; fmt = "" fmt
  if (s == "") return __NOW
  if (fmt != "") {
    u = __ts_parse(s, fmt)
    if (__TS_ERR) __fail("failed to parse timestamp '" s "' with format '" fmt "'")
    return u
  }
  return __ts_try(s)
}
function timestamp_unix_nano(s, fmt,   u, rem) {
  s = "" s; fmt = "" fmt
  if (s == "") return __NOW "000000000"
  if (fmt != "") {
    u = __ts_parse(s, fmt)
    if (__TS_ERR) __fail("failed to parse timestamp '" s "' with format '" fmt "'")
  } else u = __ts_try(s)
  if (u >= 0 || __TS_FRAC == "000000000") return sprintf("%d", u) __TS_FRAC
  # pre-1970 with a fraction: total = u + frac/1e9 with u < 0 < frac, so
  # borrow one second (naive digit concat would yield -1.5s for -0.5s)
  rem = 1000000000 - (__TS_FRAC + 0)
  if (u == -1) return "-" rem
  return "-" sprintf("%d", -u - 1) sprintf("%09d", rem)
}

# Format unix seconds (+ 9-digit nano string) as a Go layout, in UTC.
function __ts_fmt(sec, ns9, layout,   days, rem, Y, Mo, D, H, Mi, Se, li, ll, out, h12) {
  sec = sec + 0
  days = int(sec / 86400); rem = sec - days * 86400
  if (rem < 0) { rem += 86400; days-- }
  __civil_from_days(days)
  Y = __CY; Mo = __CM; D = __CD
  H = int(rem / 3600); Mi = int((rem % 3600) / 60); Se = rem % 60
  out = ""; li = 1; ll = length(layout)
  while (li <= ll) {
    if (substr(layout, li, 4) == "2006") { out = out sprintf("%04d", Y); li += 4 }
    else if (substr(layout, li, 10) == ".000000000") { out = out "." ns9; li += 10 }
    else if (substr(layout, li, 7) == ".000000") { out = out "." substr(ns9, 1, 6); li += 7 }
    else if (substr(layout, li, 4) == ".000") { out = out "." substr(ns9, 1, 3); li += 4 }
    else if (substr(layout, li, 3) == "Jan") { out = out __MONN[Mo]; li += 3 }
    else if (substr(layout, li, 3) == "Mon") { out = out __DOWN[(((days % 7) + 7) + 4) % 7]; li += 3 }
    else if (substr(layout, li, 3) == "MST") { out = out "UTC"; li += 3 }
    else if (substr(layout, li, 6) == "Z07:00") { out = out "Z"; li += 6 }
    else if (substr(layout, li, 6) == "-07:00") { out = out "+00:00"; li += 6 }
    else if (substr(layout, li, 5) == "Z0700") { out = out "Z"; li += 5 }
    else if (substr(layout, li, 5) == "-0700") { out = out "+0000"; li += 5 }
    else if (substr(layout, li, 2) == "01") { out = out sprintf("%02d", Mo); li += 2 }
    else if (substr(layout, li, 2) == "02") { out = out sprintf("%02d", D); li += 2 }
    else if (substr(layout, li, 2) == "03") { h12 = H % 12; if (h12 == 0) h12 = 12; out = out sprintf("%02d", h12); li += 2 }
    else if (substr(layout, li, 2) == "04") { out = out sprintf("%02d", Mi); li += 2 }
    else if (substr(layout, li, 2) == "05") { out = out sprintf("%02d", Se); li += 2 }
    else if (substr(layout, li, 2) == "06") { out = out sprintf("%02d", Y % 100); li += 2 }
    else if (substr(layout, li, 2) == "15") { out = out sprintf("%02d", H); li += 2 }
    else if (substr(layout, li, 2) == "PM") { out = out ((H >= 12) ? "PM" : "AM"); li += 2 }
    else if (substr(layout, li, 2) == "pm") { out = out ((H >= 12) ? "pm" : "am"); li += 2 }
    else if (substr(layout, li, 1) == "1") { out = out Mo; li += 1 }
    else if (substr(layout, li, 1) == "2") { out = out D; li += 1 }
    else if (substr(layout, li, 1) == "3") { h12 = H % 12; if (h12 == 0) h12 = 12; out = out h12; li += 1 }
    else { out = out substr(layout, li, 1); li += 1 }
  }
  return out
}

function timestamp_format(unix, formatArg,   fmt) {
  fmt = "" formatArg
  if (fmt == "") fmt = "2006-01-02T15:04:05Z07:00"
  return __ts_fmt(unix + 0, "000000000", fmt)
}
function timestamp_format_nano(unixNano, formatArg,   fmt, s, sec, ns) {
  fmt = "" formatArg
  if (fmt == "") fmt = "2006-01-02T15:04:05Z07:00"
  s = "" unixNano
  if (s ~ /^[0-9]+$/) {
    if (length(s) <= 9) { sec = 0; ns = substr("000000000" s, length(s) + 1) }
    else { sec = substr(s, 1, length(s) - 9) + 0; ns = substr(s, length(s) - 8) }
  } else { sec = int(unixNano / 1000000000); ns = sprintf("%09d", unixNano - sec * 1000000000) }
  return __ts_fmt(sec, ns, fmt)
}

BEGIN {
  __US = sprintf("%c", 31) # \037 as a dynamic regex (octal in /.../ is not portable)
  __MON3["Jan"]=1; __MON3["Feb"]=2; __MON3["Mar"]=3; __MON3["Apr"]=4
  __MON3["May"]=5; __MON3["Jun"]=6; __MON3["Jul"]=7; __MON3["Aug"]=8
  __MON3["Sep"]=9; __MON3["Oct"]=10; __MON3["Nov"]=11; __MON3["Dec"]=12
  __MONN[1]="Jan"; __MONN[2]="Feb"; __MONN[3]="Mar"; __MONN[4]="Apr"
  __MONN[5]="May"; __MONN[6]="Jun"; __MONN[7]="Jul"; __MONN[8]="Aug"
  __MONN[9]="Sep"; __MONN[10]="Oct"; __MONN[11]="Nov"; __MONN[12]="Dec"
  __DOW3["Sun"]=0; __DOW3["Mon"]=1; __DOW3["Tue"]=2; __DOW3["Wed"]=3
  __DOW3["Thu"]=4; __DOW3["Fri"]=5; __DOW3["Sat"]=6
  __DOWN[0]="Sun"; __DOWN[1]="Mon"; __DOWN[2]="Tue"; __DOWN[3]="Wed"
  __DOWN[4]="Thu"; __DOWN[5]="Fri"; __DOWN[6]="Sat"
}
