// ADS-B plan view — polls the tracker block's ctrl_port handler exactly
// like the reference's script.js (fetch_fg → find tracker → poll register,
// examples/adsb/dist/script.js:40-195), but renders on a plain canvas
// (no Leaflet/OSM tiles — works fully offline).
"use strict";
const $ = (id) => document.getElementById(id);
const api = (p, opts) => fetch(p, opts).then((r) => {
  if (!r.ok) throw new Error(`HTTP ${r.status}`);
  return r.json();
});

let trackerId = null;

async function findTracker() {
  const ids = await api("/api/fg/");
  for (const fgid of ids) {
    const fg = await api(`/api/fg/${fgid}/`);
    for (let i = 0; i < fg.blocks.length; i++) {
      const b = fg.blocks[i];
      if ((b.type_name || "").includes("Tracker")) {
        return [fgid, i];
      }
    }
  }
  throw new Error("no Tracker block in any flowgraph");
}

async function fetchRegister() {
  const [fgid, bid] = trackerId;
  const res = await api(`/api/fg/${fgid}/block/${bid}/call/ctrl_port/`, {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: "null",
  });
  // Pmt::String(JSON) — same contract as the reference (script.js:174)
  return JSON.parse(res.String);
}

function latest(arr) { return arr.length ? arr[arr.length - 1] : null; }
function epoch(t) {
  return t ? t.secs_since_epoch + t.nanos_since_epoch / 1e9 : 0;
}

function draw(register) {
  const cv = $("plan");
  const ctx = cv.getContext("2d");
  const W = cv.width, H = cv.height, PAD = 40;
  ctx.fillStyle = "#0a1420";
  ctx.fillRect(0, 0, W, H);

  // collect every known position to auto-scale the view
  const recs = Object.entries(register.register || {});
  const pts = [];
  for (const [, r] of recs) {
    for (const p of r.positions) {
      pts.push([p.position.latitude, p.position.longitude]);
    }
  }
  if (!pts.length) {
    ctx.fillStyle = "#667";
    ctx.fillText("no positioned aircraft yet", W / 2 - 70, H / 2);
    return;
  }
  let lat0 = Math.min(...pts.map((p) => p[0]));
  let lat1 = Math.max(...pts.map((p) => p[0]));
  let lon0 = Math.min(...pts.map((p) => p[1]));
  let lon1 = Math.max(...pts.map((p) => p[1]));
  const mlat = Math.max(0.05, (lat1 - lat0) * 0.15);
  const mlon = Math.max(0.05, (lon1 - lon0) * 0.15);
  lat0 -= mlat; lat1 += mlat; lon0 -= mlon; lon1 += mlon;
  const X = (lon) => PAD + ((lon - lon0) / (lon1 - lon0)) * (W - 2 * PAD);
  const Y = (lat) => H - PAD - ((lat - lat0) / (lat1 - lat0)) * (H - 2 * PAD);

  // graticule
  ctx.strokeStyle = "#1d2c3d"; ctx.fillStyle = "#456"; ctx.font = "10px monospace";
  const gstep = (hi, lo) => Math.pow(10, Math.floor(Math.log10((hi - lo) / 4)));
  const gx = gstep(lon1, lon0), gy = gstep(lat1, lat0);
  for (let lon = Math.ceil(lon0 / gx) * gx; lon <= lon1; lon += gx) {
    ctx.beginPath(); ctx.moveTo(X(lon), 0); ctx.lineTo(X(lon), H); ctx.stroke();
    ctx.fillText(lon.toFixed(2), X(lon) + 2, H - 4);
  }
  for (let lat = Math.ceil(lat0 / gy) * gy; lat <= lat1; lat += gy) {
    ctx.beginPath(); ctx.moveTo(0, Y(lat)); ctx.lineTo(W, Y(lat)); ctx.stroke();
    ctx.fillText(lat.toFixed(2), 4, Y(lat) - 2);
  }

  const now = Date.now() / 1e3;
  for (const [icao, r] of recs) {
    const pos = latest(r.positions);
    if (!pos) continue;
    const vel = latest(r.velocities);
    const age = now - epoch(r.last_seen);
    const stale = age > 30;
    // trail
    ctx.strokeStyle = stale ? "#553" : "#c55";
    ctx.globalAlpha = 0.5;
    ctx.beginPath();
    r.positions.forEach((p, i) => {
      const x = X(p.position.longitude), y = Y(p.position.latitude);
      i ? ctx.lineTo(x, y) : ctx.moveTo(x, y);
    });
    ctx.stroke();
    ctx.globalAlpha = 1.0;
    // rotated aircraft triangle (rotatedMarker parity)
    const x = X(pos.position.longitude), y = Y(pos.position.latitude);
    const hdg = ((vel && vel.velocity.heading) || 0) * Math.PI / 180;
    ctx.save();
    ctx.translate(x, y);
    ctx.rotate(hdg);
    ctx.fillStyle = stale ? "#887" : "#fc6";
    ctx.beginPath();
    ctx.moveTo(0, -9); ctx.lineTo(6, 8); ctx.lineTo(0, 4);
    ctx.lineTo(-6, 8); ctx.closePath();
    ctx.fill();
    ctx.restore();
    ctx.fillStyle = stale ? "#776" : "#9cf";
    ctx.fillText(
      `${(r.callsign || icao).trim()} ${pos.position.altitude ?? ""}`,
      x + 9, y + 3
    );
  }
}

function table(register) {
  const tb = $("actable").querySelector("tbody");
  tb.innerHTML = "";
  const now = Date.now() / 1e3;
  for (const [icao, r] of Object.entries(register.register || {})) {
    const pos = latest(r.positions);
    const vel = latest(r.velocities);
    const age = now - epoch(r.last_seen);
    const tr = document.createElement("tr");
    if (age > 30) tr.className = "stale";
    const v = vel ? vel.velocity : {};
    tr.innerHTML =
      `<td>${icao.toUpperCase()}</td><td>${r.callsign || "-"}</td>` +
      `<td>${pos ? pos.position.latitude.toFixed(4) : "-"}</td>` +
      `<td>${pos ? pos.position.longitude.toFixed(4) : "-"}</td>` +
      `<td>${(pos && pos.position.altitude) ?? "-"}</td>` +
      `<td>${v.ground_speed != null ? v.ground_speed.toFixed(0) : "-"}</td>` +
      `<td>${v.heading != null ? v.heading.toFixed(0) : "-"}</td>` +
      `<td>${v.vertical_rate ?? "-"}</td>` +
      `<td>${age.toFixed(0)}</td>`;
    tb.appendChild(tr);
  }
}

async function tick() {
  try {
    if (trackerId === null) trackerId = await findTracker();
    const reg = await fetchRegister();
    $("acstatus").textContent =
      `${Object.keys(reg.register || {}).length} aircraft`;
    draw(reg);
    table(reg);
  } catch (e) {
    $("acstatus").textContent = String(e);
    trackerId = null;
  }
}
tick();
setInterval(tick, 1000);
