// futuresdr_tpu GUI — prophecy capability parity in plain JS.
// Components (crates/prophecy/src/lib.rs:9-52):
//   FlowgraphCanvas  -> drawCanvas()        (SVG layered DAG)
//   FlowgraphTable   -> drawTable()
//   PmtEditor/Input  -> pmt editor section  (+ quick sliders)
//   TimeSink         -> scope 'line' mode
//   Waterfall        -> scope 'spectrum' mode
//   ConstellationSink[Density] -> constellation section
//   poll_periodically/call_periodically -> pollStats()/callHandler()

"use strict";
const $ = (id) => document.getElementById(id);
const api = (p) => fetch(p).then((r) => r.json());

let FG = null; // current flowgraph description
let FGID = null;

// ---------------------------------------------------------------- REST ----
async function refreshList() {
  try {
    const ids = await api("/api/fg/");
    const sel = $("fgsel");
    sel.innerHTML = "";
    for (const id of ids) {
      const o = document.createElement("option");
      o.value = id; o.textContent = "fg " + id;
      sel.appendChild(o);
    }
    if (ids.length) { FGID = ids[0]; await loadFg(FGID); }
  } catch (e) { console.warn("list failed", e); }
}

async function loadFg(id) {
  FG = await api(`/api/fg/${id}/`);
  FGID = id;
  drawCanvas(FG);
  drawTable(FG);
  fillPmtEditor(FG);
}

async function pollStats() {
  if (FGID === null) return;
  try {
    const s = await api(`/api/fg/${FGID}/stats/`);
    const gs = s.samples_per_s ? (s.samples_per_s / 1e9).toFixed(3) : null;
    // per-block device-cost attribution (handle.profile_blocks result)
    let costs = "";
    if (s.block_cost_pct && FG &&
        JSON.stringify(s.block_cost_pct) !== JSON.stringify(BLOCK_COSTS)) {
      BLOCK_COSTS = s.block_cost_pct;
      drawTable(FG);  // refresh the dev% column
    }
    if (s.block_cost_pct) {
      costs = " · " + Object.entries(s.block_cost_pct)
        .filter(([k, _]) => k !== "(unattributed)")
        .slice(0, 3)
        .map(([k, v]) => `${k} ${v.toFixed(0)}%`)
        .join(" ");
    }
    $("stats").textContent =
      `steps ${s.steps ?? "?"} · ` +
      (gs ? `${gs} GS/s · ` : "") +
      `up ${s.elapsed_s ? s.elapsed_s.toFixed(1) : "?"} s` + costs;
  } catch (e) { /* stats optional */ }
}

// ----------------------------------------------------- FlowgraphCanvas ----
function layerLayout(fg) {
  // layered DAG: depth = longest forward path from any source
  const n = fg.blocks.length;
  const depth = new Array(n).fill(0);
  const edges = fg.stream_edges.concat(fg.message_edges || []);
  for (let pass = 0; pass < n; pass++) {
    let moved = false;
    for (const e of edges) {
      if (e.feedback) continue;
      if (depth[e.dst_block] < depth[e.src_block] + 1) {
        depth[e.dst_block] = depth[e.src_block] + 1; moved = true;
      }
    }
    if (!moved) break;
  }
  const cols = {};
  const pos = [];
  for (let i = 0; i < n; i++) {
    const c = depth[i];
    cols[c] = (cols[c] ?? 0);
    pos.push({ col: c, row: cols[c] });
    cols[c]++;
  }
  return pos;
}

function drawCanvas(fg) {
  const svg = $("canvas");
  const pos = layerLayout(fg);
  const W = 150, H = 46, GX = 60, GY = 24;
  const ncols = Math.max(...pos.map((p) => p.col)) + 1;
  const nrows = Math.max(...pos.map((p) => p.row)) + 1;
  svg.setAttribute("width", Math.max(640, ncols * (W + GX) + 40));
  svg.setAttribute("height", Math.max(300, nrows * (H + GY) + 40));
  const X = (p) => 20 + p.col * (W + GX);
  const Y = (p) => 20 + p.row * (H + GY);
  let s = `<defs><marker id="arrow" viewBox="0 0 8 8" refX="7" refY="4"
    markerWidth="6" markerHeight="6" orient="auto">
    <path d="M0 0 L8 4 L0 8 z" fill="#6a8"/></marker></defs>`;
  const anchor = (bid, out) => {
    const p = pos[bid];
    return [X(p) + (out ? W : 0), Y(p) + H / 2];
  };
  const curve = (a, b) => {
    const mx = (a[0] + b[0]) / 2;
    return `M${a[0]} ${a[1]} C ${mx} ${a[1]}, ${mx} ${b[1]}, ${b[0]} ${b[1]}`;
  };
  for (const e of fg.stream_edges) {
    const cls = e.feedback ? "fbedge" : "edge";
    s += `<path class="${cls}" d="${curve(anchor(e.src_block, 1),
      anchor(e.dst_block, 0))}"><title>${e.src_port}→${e.dst_port} ` +
      `(${e.dtype || ""})</title></path>`;
  }
  for (const e of (fg.message_edges || [])) {
    s += `<path class="msgedge" d="${curve(anchor(e.src_block, 1),
      anchor(e.dst_block, 0))}"><title>${e.src_port}→${e.dst_port}</title></path>`;
  }
  fg.blocks.forEach((b, i) => {
    const p = pos[i];
    const cls = "blocknode" +
      (b.stream_inputs.length === 0 && b.stream_outputs.length ? " hostsrc" : "") +
      (b.stream_outputs.length === 0 && b.stream_inputs.length ? " hostsink" : "");
    s += `<g onclick="selectBlock(${i})" style="cursor:pointer">` +
      `<rect class="${cls}" x="${X(p)}" y="${Y(p)}" width="${W}" height="${H}"/>` +
      `<text class="blocklabel" x="${X(p) + 8}" y="${Y(p) + 18}">` +
      `${b.instance_name}</text>` +
      `<text class="portlabel" x="${X(p) + 8}" y="${Y(p) + 34}">` +
      `${b.type_name}</text></g>`;
  });
  svg.innerHTML = s;
}

// ------------------------------------------------------ FlowgraphTable ----
let BLOCK_COSTS = null;  // handle.profile_blocks() result, via /stats/

function drawTable(fg) {
  const tb = $("blocktable").querySelector("tbody");
  tb.innerHTML = "";
  fg.blocks.forEach((b, i) => {
    const tr = document.createElement("tr");
    const cost = BLOCK_COSTS && BLOCK_COSTS[b.instance_name] !== undefined
      ? BLOCK_COSTS[b.instance_name].toFixed(1) : "";
    tr.innerHTML = `<td>${i}</td><td>${b.instance_name}</td>` +
      `<td>${b.type_name}</td>` +
      `<td>${b.stream_inputs.join(", ")}</td>` +
      `<td>${b.stream_outputs.join(", ")}</td>` +
      `<td>${(b.message_inputs || []).join(", ")}</td>` +
      `<td class="dim">${cost}</td>`;
    tr.onclick = () => selectBlock(i);
    tb.appendChild(tr);
  });
}

function selectBlock(i) {
  const rows = $("blocktable").querySelectorAll("tbody tr");
  rows.forEach((r, j) => r.classList.toggle("sel", j === i));
  $("pe_block").value = i;
  fillHandlers();
}
window.selectBlock = selectBlock;

// ---------------------------------------------------------- PmtEditor ----
function fillPmtEditor(fg) {
  const bs = $("pe_block");
  bs.innerHTML = "";
  fg.blocks.forEach((b, i) => {
    const o = document.createElement("option");
    o.value = i; o.textContent = `${i}: ${b.instance_name}`;
    bs.appendChild(o);
  });
  bs.onchange = fillHandlers;
  fillHandlers();
}

function fillHandlers() {
  const b = FG.blocks[Number($("pe_block").value) || 0];
  const hs = $("pe_handler");
  hs.innerHTML = "";
  for (const h of (b?.message_inputs || [])) {
    const o = document.createElement("option");
    o.value = h; o.textContent = h;
    hs.appendChild(o);
  }
  buildSliders(b);
}

async function callHandler(bid, handler, value) {
  const r = await fetch(`/api/fg/${FGID}/block/${bid}/call/${handler}/`, {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify(value),
  });
  return r.json();
}

$("pe_call").onclick = async () => {
  const bid = Number($("pe_block").value);
  const handler = $("pe_handler").value;
  let value = null;
  const raw = $("pe_value").value.trim();
  if (raw) {
    try { value = JSON.parse(raw); }
    catch { value = raw; } // bare string Pmt
  }
  try {
    const res = await callHandler(bid, handler, value);
    $("pe_result").textContent = JSON.stringify(res);
  } catch (e) { $("pe_result").textContent = "error: " + e; }
};

// quick retune sliders for common numeric handlers (prophecy Slider parity)
const SLIDER_SPECS = {
  freq: { min: 0, max: 2e9, step: 1e5 },
  gain: { min: 0, max: 60, step: 0.5 },
  sample_rate: { min: 1e5, max: 5e7, step: 1e5 },
};
function buildSliders(b) {
  const box = $("pe_sliders");
  box.innerHTML = "";
  for (const h of (b?.message_inputs || [])) {
    const spec = SLIDER_SPECS[h];
    if (!spec) continue;
    const lab = document.createElement("label");
    lab.innerHTML = `${h} <input type="range" min="${spec.min}"
      max="${spec.max}" step="${spec.step}" style="flex:1">
      <span class="dim">-</span>`;
    const rng = lab.querySelector("input");
    const out = lab.querySelector("span");
    rng.oninput = () => { out.textContent = Number(rng.value).toExponential(3); };
    rng.onchange = async () => {
      const bid = Number($("pe_block").value);
      await callHandler(bid, h, Number(rng.value));
    };
    box.appendChild(lab);
  }
}

// ------------------------------------------- TimeSink/Spectrum/Waterfall --
let tsWs = null, wfRow = 0;
function colormap(v) {
  const r = Math.max(0, Math.min(255, 255 * (1.5 * v - 0.25)));
  const g = Math.max(0, Math.min(255, 255 * (1.6 * v - 0.1)));
  const b = Math.max(0, Math.min(255, 255 * (1.2 - 1.5 * Math.abs(v - 0.35))));
  return [r, g, b];
}
$("ts_start").onclick = () => {
  if (tsWs) tsWs.close();
  const n = parseInt($("ts_n").value);
  const mode = $("ts_mode").value;
  const scope = $("scope").getContext("2d");
  const wfc = $("waterfall");
  const wf = wfc.getContext("2d");
  const W = $("scope").width, H = $("scope").height;
  tsWs = new WebSocket($("ts_url").value);
  tsWs.binaryType = "arraybuffer";
  tsWs.onopen = () => { $("ts_status").textContent = "connected"; };
  tsWs.onclose = () => { $("ts_status").textContent = "closed"; };
  let buf = new Float32Array(0);
  tsWs.onmessage = (ev) => {
    const d = new Float32Array(ev.data);
    // frames may arrive in arbitrary chunk sizes: accumulate to n
    const merged = new Float32Array(buf.length + d.length);
    merged.set(buf); merged.set(d, buf.length);
    buf = merged;
    while (buf.length >= n) {
      const frame = buf.subarray(0, n);
      drawFrame(frame);
      buf = buf.slice(n);
    }
  };
  function drawFrame(fr) {
    let lo = Infinity, hi = -Infinity;
    for (const v of fr) { if (v < lo) lo = v; if (v > hi) hi = v; }
    if (hi - lo < 1e-9) hi = lo + 1e-9;
    scope.fillStyle = "#0a0a0a"; scope.fillRect(0, 0, W, H);
    scope.strokeStyle = mode === "line" ? "#6cf" : "#fc6";
    scope.beginPath();
    for (let i = 0; i < n; i++) {
      const x = (i / (n - 1)) * W;
      const y = H - ((fr[i] - lo) / (hi - lo)) * (H - 8) - 4;
      i ? scope.lineTo(x, y) : scope.moveTo(x, y);
    }
    scope.stroke();
    if (mode === "spectrum") {
      const img = wf.createImageData(wfc.width, 1);
      for (let x = 0; x < wfc.width; x++) {
        const v = (fr[Math.floor((x / wfc.width) * n)] - lo) / (hi - lo);
        const [r, g, b] = colormap(v);
        img.data.set([r, g, b, 255], x * 4);
      }
      wf.putImageData(img, 0, wfRow);
      wfRow = (wfRow + 1) % wfc.height;
    }
  }
};

// ------------------------------------------------- ConstellationSink -----
let csWs = null, density = null;
$("cs_start").onclick = () => {
  if (csWs) csWs.close();
  const cv = $("constellation");
  const ctx = cv.getContext("2d");
  const Wc = cv.width, Hc = cv.height;
  const mode = $("cs_mode").value;
  density = new Float32Array(Wc * Hc);
  csWs = new WebSocket($("cs_url").value);
  csWs.binaryType = "arraybuffer";
  csWs.onopen = () => { $("cs_status").textContent = "connected"; };
  csWs.onclose = () => { $("cs_status").textContent = "closed"; };
  csWs.onmessage = (ev) => {
    const d = new Float32Array(ev.data); // interleaved I/Q
    const scale = 0.35 * Wc; // ±~1.4 full-scale
    ctx.fillStyle = mode === "scatter" ? "rgba(10,10,10,0.25)" : "#0a0a0a";
    if (mode === "scatter") ctx.fillRect(0, 0, Wc, Hc);
    if (mode === "scatter") {
      ctx.fillStyle = "#6cf";
      for (let i = 0; i + 1 < d.length; i += 2) {
        const x = Wc / 2 + d[i] * scale;
        const y = Hc / 2 - d[i + 1] * scale;
        ctx.fillRect(x, y, 2, 2);
      }
    } else {
      for (let i = 0; i + 1 < d.length; i += 2) {
        const x = Math.round(Wc / 2 + d[i] * scale);
        const y = Math.round(Hc / 2 - d[i + 1] * scale);
        if (x >= 0 && x < Wc && y >= 0 && y < Hc) density[y * Wc + x] += 1;
      }
      const img = ctx.createImageData(Wc, Hc);
      let mx = 1e-9;
      for (const v of density) if (v > mx) mx = v;
      for (let i = 0; i < density.length; i++) {
        const v = Math.log1p(density[i]) / Math.log1p(mx);
        const [r, g, b] = colormap(v);
        img.data.set([r, g, b, 255], i * 4);
        density[i] *= 0.995; // slow fade
      }
      ctx.putImageData(img, 0, 0);
    }
    // axes
    ctx.strokeStyle = "#333";
    ctx.beginPath();
    ctx.moveTo(Wc / 2, 0); ctx.lineTo(Wc / 2, Hc);
    ctx.moveTo(0, Hc / 2); ctx.lineTo(Wc, Hc / 2);
    ctx.stroke();
  };
};

// ------------------------------------------------------------- wiring ----
$("refresh").onclick = refreshList;
$("fgsel").onchange = (e) => loadFg(Number(e.target.value));
refreshList();
setInterval(pollStats, 1000);
